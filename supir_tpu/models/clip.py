"""CLIP text transformers (flax), covering both SDXL towers:

  - CLIP ViT-L/14 text encoder (width 768, 12 layers, quick-gelu), used at
    hidden layer 11 (reference FrozenCLIPEmbedder, encoders/modules.py:445).
  - OpenCLIP ViT-bigG/14 text encoder (width 1280, 32 layers, gelu), used at
    the penultimate layer plus the final pooled projection (reference
    FrozenOpenCLIPEmbedder2, encoders/modules.py:510-680).

One parametric module serves both; weight layout is converter-friendly
(per-layer q/k/v/out projections, MLP fc1/fc2, pre-LN blocks, causal mask).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from supir_tpu.models.layers import Dense, FusedLayerNorm
from supir_tpu.ops import dot_product_attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    max_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12
    use_quick_gelu: bool = True
    projection_dim: Optional[int] = None  # set for OpenCLIP pooled output

    @classmethod
    def vit_l(cls) -> "CLIPTextConfig":
        return cls()

    @classmethod
    def vit_bigg(cls) -> "CLIPTextConfig":
        return cls(
            width=1280, layers=32, heads=20, use_quick_gelu=False, projection_dim=1280
        )

    def tiny(self) -> "CLIPTextConfig":
        return dataclasses.replace(
            self, width=64, layers=2, heads=4,
            projection_dim=64 if self.projection_dim else None,
        )


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias):
        c = self.cfg
        head_dim = c.width // c.heads
        b, s, _ = x.shape
        q = Dense(c.width, dtype=self.dtype, name="q_proj")(x)
        k = Dense(c.width, dtype=self.dtype, name="k_proj")(x)
        v = Dense(c.width, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, s, c.heads, head_dim)
        k = k.reshape(b, s, c.heads, head_dim)
        v = v.reshape(b, s, c.heads, head_dim)
        out = dot_product_attention(q, k, v, bias=mask_bias, impl="xla")
        return Dense(c.width, dtype=self.dtype, name="out_proj")(out.reshape(b, s, c.width))


class CLIPBlock(nn.Module):
    cfg: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias):
        # non-quick towers (OpenCLIP bigG) use the EXACT erf gelu
        # (open_clip nn.GELU()), not flax's default tanh approximation
        act = quick_gelu if self.cfg.use_quick_gelu else (
            lambda x: nn.gelu(x, approximate=False)
        )
        ln = lambda name: FusedLayerNorm(eps=1e-5, dtype=self.dtype, name=name)
        x = x + CLIPAttention(self.cfg, dtype=self.dtype, name="attn")(ln("ln_1")(x), mask_bias)
        h = ln("ln_2")(x)
        h = Dense(self.cfg.width * 4, dtype=self.dtype, name="mlp_fc1")(h)
        h = act(h)
        h = Dense(self.cfg.width, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns all hidden states; callers pick the layer they need.

    __call__(input_ids [B, 77]) -> dict:
      hidden: [layers+1, B, 77, width]  (hidden[0] = embeddings)
      final: ln_final(hidden[-1])
      pooled: final[eos] @ text_projection (if projection_dim set)
    """

    cfg: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        c = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(
            c.vocab_size, c.width, dtype=self.dtype, param_dtype=jnp.float32,
            name="token_embedding",
        )(input_ids)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.max_length, c.width),
            jnp.float32,
        )
        x = tok + pos[None, :s].astype(self.dtype)

        mask = np.full((s, s), -np.inf, np.float32)
        mask = np.triu(mask, k=1)
        mask_bias = jnp.asarray(mask)[None, None]

        hidden = [x]
        for i in range(c.layers):
            x = CLIPBlock(c, dtype=self.dtype, name=f"block_{i}")(x, mask_bias)
            hidden.append(x)

        final = FusedLayerNorm(eps=1e-5, dtype=self.dtype, name="ln_final")(x)
        out = {"hidden": hidden, "final": final}
        if c.projection_dim is not None:
            proj = self.param(
                "text_projection",
                nn.initializers.normal(c.width**-0.5),
                (c.width, c.projection_dim),
                jnp.float32,
            )
            eos_idx = jnp.argmax(input_ids, axis=-1)  # highest id = endoftext
            pooled = final[jnp.arange(b), eos_idx]
            out["pooled"] = pooled @ proj.astype(self.dtype)
        return out
