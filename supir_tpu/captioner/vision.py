"""CLIP ViT vision tower for the captioner.

Behavioral contract: `llava/model/multimodal_encoder/clip_encoder.py` —
HF CLIP ViT-L/14-336, patch features from hidden layer -2, CLS dropped
(`feature_select`, clip_encoder.py:35-44).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from supir_tpu.models.clip import CLIPBlock, CLIPTextConfig
from supir_tpu.models.layers import Dense, FusedLayerNorm

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    use_quick_gelu: bool = True

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def tiny(self) -> "CLIPVisionConfig":
        return dataclasses.replace(self, image_size=56, patch_size=14, width=64, layers=2, heads=4)

    def as_text_cfg(self) -> CLIPTextConfig:
        return CLIPTextConfig(
            width=self.width, layers=self.layers, heads=self.heads,
            use_quick_gelu=self.use_quick_gelu,
        )


class CLIPVisionTower(nn.Module):
    """Returns all hidden states; caller selects layer -2 patch tokens."""

    cfg: CLIPVisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: [B, H, W, 3] CLIP-normalized."""
        c = self.cfg
        b = pixel_values.shape[0]
        patches = nn.Conv(
            c.width, (c.patch_size, c.patch_size), strides=(c.patch_size, c.patch_size),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, c.width)
        cls_tok = self.param("class_embedding", nn.initializers.normal(0.02), (c.width,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok.astype(self.dtype), (b, 1, c.width)), patches], axis=1
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02),
            (1 + c.num_patches, c.width), jnp.float32,
        )
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        x = FusedLayerNorm(eps=1e-5, dtype=self.dtype, name="pre_layernorm")(x)
        hidden = [x]
        block_cfg = c.as_text_cfg()
        for i in range(c.layers):
            x = CLIPBlock(block_cfg, dtype=self.dtype, name=f"block_{i}")(x, None)
            hidden.append(x)
        return hidden


def select_patch_features(hidden, layer: int = -2):
    """Hidden layer -2, CLS dropped (LLaVA default feature_select)."""
    return hidden[layer][:, 1:]


CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_images(images, image_size: int, pad_to_square: bool = True):
    """uint8 HWC images -> [B, S, S, 3] CLIP-normalized float32.

    `expand2square` padding with the mean color, then bicubic resize
    (llava/mm_utils.py:14-41).
    """
    import jax
    import jax.numpy as jnp

    out = []
    for img in images:
        arr = np.asarray(img, np.float32) / 255.0
        h, w, _ = arr.shape
        if pad_to_square and h != w:
            side = max(h, w)
            canvas = np.tile(CLIP_IMAGE_MEAN, (side, side, 1)).astype(np.float32)
            y0, x0 = (side - h) // 2, (side - w) // 2
            canvas[y0 : y0 + h, x0 : x0 + w] = arr
            arr = canvas
        arr = np.asarray(
            jax.image.resize(jnp.asarray(arr), (image_size, image_size, 3), "bicubic")
        )
        arr = (arr - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
        out.append(arr)
    return np.stack(out).astype(np.float32)
