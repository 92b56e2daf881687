"""SDXL conditioner: dual text towers + sinusoidal vector embedders.

Behavioral contract: `sgm/modules/encoders/modules.py` —
  - GeneralConditionerWithControl (:193-243): concatenates per-embedder
    outputs into `crossattn` [B,77,2048] and `vector` [B,2816], passes the
    LQ control latent straight through.
  - FrozenCLIPEmbedder (:445): CLIP-L hidden layer 11 -> 768.
  - FrozenOpenCLIPEmbedder2 (:510): bigG penultimate -> 1280, pooled -> 1280.
  - ConcatTimestepEmbedderND (:1027): 256-dim sinusoid per scalar, so the
    SDXL ADM vector is pooled(1280) + orig(512) + crop(512) + target(512)
    = 2816.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from supir_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from supir_tpu.models.layers import timestep_embedding

Dtype = Any


def concat_timestep_embed(values: jnp.ndarray, outdim: int = 256) -> jnp.ndarray:
    """[B, N] scalars -> [B, N*outdim] sinusoidal embedding."""
    b, n = values.shape
    emb = timestep_embedding(values.reshape(-1), outdim)
    return emb.reshape(b, n * outdim)


@dataclasses.dataclass(frozen=True)
class ConditionerConfig:
    clip_l: CLIPTextConfig = CLIPTextConfig.vit_l()
    clip_bigg: CLIPTextConfig = CLIPTextConfig.vit_bigg()
    clip_l_hidden_layer: int = 11
    vector_outdim: int = 256

    def tiny(self) -> "ConditionerConfig":
        return dataclasses.replace(
            self, clip_l=self.clip_l.tiny(), clip_bigg=self.clip_bigg.tiny(),
            clip_l_hidden_layer=1, vector_outdim=8,
        )


class Conditioner(nn.Module):
    """Token ids -> {crossattn, vector}. Tokenization happens host-side.

    __call__(tokens_l [B,77], tokens_bigg [B,77], orig_size [B,2],
             crop [B,2], target_size [B,2])
    """

    cfg: ConditionerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens_l, tokens_bigg, orig_size, crop, target_size,
                 ucg_rng=None, ucg_rates=None):
        """ucg_rates: optional per-embedder classifier-free-guidance dropout
        rates (clip_l, clip_bigg, orig, crop, target) applied as per-sample
        Bernoulli(1-rate) multipliers during training (reference
        GeneralConditioner.forward, encoders/modules.py:152-163). Inference
        passes neither."""
        import jax

        c = self.cfg
        b = tokens_l.shape[0]

        def ucg(emb, idx):
            if ucg_rng is None or ucg_rates is None or ucg_rates[idx] <= 0.0:
                return emb
            keep = jax.random.bernoulli(
                jax.random.fold_in(ucg_rng, idx), 1.0 - ucg_rates[idx], (b,)
            ).astype(emb.dtype)
            return emb * keep.reshape((b,) + (1,) * (emb.ndim - 1))

        out_l = CLIPTextModel(c.clip_l, dtype=self.dtype, name="clip_l")(tokens_l)
        out_g = CLIPTextModel(c.clip_bigg, dtype=self.dtype, name="clip_bigg")(tokens_bigg)
        # CLIP-L: hidden layer (no final LN); bigG: penultimate hidden
        emb_l = ucg(out_l["hidden"][c.clip_l_hidden_layer], 0)
        emb_g = ucg(out_g["hidden"][-2], 1)
        crossattn = jnp.concatenate([emb_l, emb_g], axis=-1)

        # the pooled output is a second output of the bigG embedder: same
        # rate, independent draw (reference loops `for emb in emb_out`)
        def ucg_pooled(emb):
            if ucg_rng is None or ucg_rates is None or ucg_rates[1] <= 0.0:
                return emb
            keep = jax.random.bernoulli(
                jax.random.fold_in(ucg_rng, 5), 1.0 - ucg_rates[1], (b,)
            ).astype(emb.dtype)
            return emb * keep[:, None]

        vec_parts = [ucg_pooled(out_g["pooled"])]
        for i, v in enumerate((orig_size, crop, target_size)):
            emb_v = concat_timestep_embed(v.astype(jnp.float32), c.vector_outdim).astype(
                self.dtype
            )
            vec_parts.append(ucg(emb_v, 2 + i))
        vector = jnp.concatenate(vec_parts, axis=-1)
        return {"crossattn": crossattn, "vector": vector}
