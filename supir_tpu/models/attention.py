"""Transformer attention stack for the diffusion UNet.

Mirrors the behavior of `sgm/modules/attention.py` (CrossAttention,
BasicTransformerBlock with GEGLU feed-forward, SpatialTransformer with
linear token projections and zero-init output) with a single attention
entry point (`supir_tpu.ops.dot_product_attention`) replacing the
xformers/SDPA backend zoo.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from supir_tpu.models.layers import Dense, FusedLayerNorm, GroupNorm32
from supir_tpu.ops import dot_product_attention

Dtype = Any


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None.

    query_dim -> inner_dim = heads * dim_head -> query_dim.
    q/k/v projections have no bias; output projection has bias
    (reference attention.py:196-233).
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        b, s, _ = q.shape
        t = k.shape[1]
        q = q.reshape(b, s, self.heads, self.dim_head)
        k = k.reshape(b, t, self.heads, self.dim_head)
        v = v.reshape(b, t, self.heads, self.dim_head)
        out = dot_product_attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, s, inner)
        return Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        # reference GEGLU is x * F.gelu(gate) — exact erf (attention.py:91).
        # erf lowers to a much slower VPU sequence than tanh on TPU: exact
        # erf costs 0.77 s/image over the 50-step sampler (9.19 vs 8.43,
        # ab_r05 `headline` vs `headline_gelu_approx`, same chip+window).
        # Under bf16 compute the tanh approximation's max error (~3e-4) is
        # below bf16 representational noise (~4e-3), so bf16 defaults to
        # tanh; fp32 keeps exact erf (torch goldens stay exact, atol 2e-4).
        # SUPIR_GEGLU_APPROX=0/1 force-overrides either way (perf A/B).
        import os

        env = os.environ.get("SUPIR_GEGLU_APPROX")
        approx = env == "1" if env is not None else self.dtype == jnp.bfloat16
        return x * nn.gelu(gate, approximate=approx)


class FeedForward(nn.Module):
    """GEGLU feed-forward, mult=4 (reference attention.py:84-110)."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="geglu")(x)
        return Dense(self.dim, dtype=self.dtype, name="proj_out")(x)


class BasicTransformerBlock(nn.Module):
    """LayerNorm -> self-attn -> LayerNorm -> cross-attn -> LayerNorm -> FF,
    each with a residual (reference attention.py:376-470)."""

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    disable_self_attn: bool = False
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        ln = lambda name: FusedLayerNorm(eps=1e-5, dtype=self.dtype, name=name)
        h = ln("norm1")(x)
        h = CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim if self.disable_self_attn else None,
            heads=self.heads,
            dim_head=self.dim_head,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            name="attn1",
        )(h, context if self.disable_self_attn else None)
        x = x + h
        h = ln("norm2")(x)
        h = CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim,
            heads=self.heads,
            dim_head=self.dim_head,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            name="attn2",
        )(h, context)
        x = x + h
        h = ln("norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """GN32 -> (linear) token projection -> depth x transformer blocks ->
    zero-init output projection -> residual (reference attention.py:533-635).

    NHWC: tokens are the flattened H*W axis.
    """

    in_channels: int
    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_linear: bool = True
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(eps=1e-6, dtype=self.dtype, name="norm")(x)
        x = x.reshape(b, h * w, c)
        # config uses use_linear_in_transformer: True; 1x1-conv mode would be
        # identical math on NHWC tokens, so only linear is implemented.
        x = Dense(inner, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                dim=inner,
                heads=self.heads,
                dim_head=self.dim_head,
                context_dim=self.context_dim,
                attn_impl=self.attn_impl,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, context)
        x = Dense(c, zero_init=True, dtype=self.dtype, name="proj_out")(x)
        return x.reshape(b, h, w, c) + x_in
