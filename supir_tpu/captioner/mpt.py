"""MPT decoder variant for the captioner (llava-mpt family).

Behavioral contract: `llava/model/language_model/mpt/` — MPTModel
(modeling_mpt.py:33) with ALiBi positional bias (attention.py:292), pre-LN
blocks without biases, optional MultiQuery attention (attention.py:204),
and low-precision LayerNorm (norm.py). The reference ships a Triton flash
kernel for this path (flash_attn_triton.py:51-497); here the same Pallas
flash attention kernel used everywhere else serves it (ALiBi enters as an
additive bias, which the dispatch routes through the XLA path; a fused
ALiBi flash variant is a later optimization).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.models.layers import Dense
from supir_tpu.ops import dot_product_attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class MPTConfig:
    vocab_size: int = 50432
    d_model: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    multiquery: bool = False
    alibi_bias_max: float = 8.0
    max_seq_len: int = 2048

    @property
    def head_dim(self):
        return self.d_model // self.n_heads

    def tiny(self) -> "MPTConfig":
        return dataclasses.replace(
            self, vocab_size=128, d_model=64, n_layers=2, n_heads=4, max_seq_len=64
        )


def build_alibi_bias(n_heads: int, seq_len: int, bias_max: float = 8.0) -> np.ndarray:
    """[1, H, 1, S] ALiBi slopes*distance (reference attention.py:292-311).

    Slopes follow the MPT convention: 1/2^(i*bias_max/ceil_pow2(H)); when H
    is not a power of two the odd slopes are interleaved."""
    dist = np.arange(1 - seq_len, 1, dtype=np.float32)[None, None, None, :]
    ceil_p2 = 2 ** math.ceil(math.log2(n_heads))
    m = np.arange(1, ceil_p2 + 1, dtype=np.float32) * bias_max / ceil_p2
    slopes = 1.0 / (2.0**m)
    if ceil_p2 != n_heads:
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return (dist * slopes[None, :, None, None]).astype(np.float32)


class LPLayerNorm(nn.Module):
    """Low-precision LayerNorm: params downcast to activation dtype, stats
    in fp32 (reference norm.py)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(
            use_bias=True, dtype=jnp.float32, param_dtype=jnp.float32, name="ln"
        )(x.astype(jnp.float32)).astype(self.dtype)


class MPTBlock(nn.Module):
    cfg: MPTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, alibi_bias):
        c = self.cfg
        hd = c.head_dim
        b, s, _ = x.shape
        kv_heads = 1 if c.multiquery else c.n_heads

        h = LPLayerNorm(dtype=self.dtype, name="norm_1")(x)
        qkv_dim = c.d_model + 2 * kv_heads * hd
        qkv = Dense(qkv_dim, use_bias=False, dtype=self.dtype, name="Wqkv")(h)
        q = qkv[..., : c.d_model].reshape(b, s, c.n_heads, hd)
        k = qkv[..., c.d_model : c.d_model + kv_heads * hd].reshape(b, s, kv_heads, hd)
        v = qkv[..., c.d_model + kv_heads * hd :].reshape(b, s, kv_heads, hd)
        if c.multiquery:
            k = jnp.broadcast_to(k, (b, s, c.n_heads, hd))
            v = jnp.broadcast_to(v, (b, s, c.n_heads, hd))
        out = dot_product_attention(q, k, v, bias=alibi_bias, causal=True)
        x = x + Dense(c.d_model, use_bias=False, dtype=self.dtype, name="out_proj")(
            out.reshape(b, s, c.d_model)
        )

        h = LPLayerNorm(dtype=self.dtype, name="norm_2")(x)
        h = Dense(4 * c.d_model, use_bias=False, dtype=self.dtype, name="up_proj")(h)
        h = nn.gelu(h)
        return x + Dense(c.d_model, use_bias=False, dtype=self.dtype, name="down_proj")(h)


class MPTForCausalLM(nn.Module):
    """Tied-embedding MPT causal LM (reference modeling_mpt.py:232-330)."""

    cfg: MPTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids):
        c = self.cfg
        wte = nn.Embed(
            c.vocab_size, c.d_model, dtype=self.dtype, param_dtype=jnp.float32,
            name="wte",
        )
        x = wte(ids)
        s = ids.shape[1]
        alibi = jnp.asarray(build_alibi_bias(c.n_heads, s, c.alibi_bias_max))
        for i in range(c.n_layers):
            x = MPTBlock(c, dtype=self.dtype, name=f"block_{i}")(x, alibi)
        x = LPLayerNorm(dtype=self.dtype, name="norm_f")(x)
        # tied lm head
        logits = wte.attend(x.astype(jnp.float32))
        return logits
