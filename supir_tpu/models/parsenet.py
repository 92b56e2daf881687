"""ParseNet face parser (TPU-native).

Replaces the reference's facexlib parsing backend
(`SUPIR/utils/face_restoration_helper.py:118` →
`facexlib.parsing.init_parsing_model('parsenet')`): a compact
encoder/body/decoder hourglass that maps a 512x512 face crop to a
19-class parsing map (+ an auxiliary RGB reconstruction).

The paste-back path only consumes `argmax(mask)` resampled through the
MASK_COLORMAP (face_restoration_helper.py:448-463); this module provides
exactly that mask via `parse_mask()`.

Architecture (facexlib parsenet.py, in_size=out_size=512,
min_feat_size=32, base 64, res_depth=10, channel clip [32, 256]):
  encoder: 3->64 conv, then 4 stride-2 residual downs 64->128->256->256->256
  body:    10 residual blocks at 256
  decoder: 4 nearest-up residual blocks 256->256->128->64->... (clipped)
  heads:   1 conv to 3 (img), 1 conv to 19 (mask)
Residual blocks are pre-activation (norm+relu before conv1) with a conv
shortcut whenever the shape changes. Norms are inference-mode BatchNorm
affines on the checkpoint's running stats.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def _bn(mod: nn.Module, prefix: str, c: int, x):
    scale = mod.param(f"{prefix}_scale", nn.initializers.ones, (c,), jnp.float32)
    bias = mod.param(f"{prefix}_bias", nn.initializers.zeros, (c,), jnp.float32)
    mean = mod.param(f"{prefix}_mean", nn.initializers.zeros, (c,), jnp.float32)
    var = mod.param(f"{prefix}_var", nn.initializers.ones, (c,), jnp.float32)
    a = scale * jax.lax.rsqrt(var + 1e-5)
    return x * a.astype(x.dtype) + (bias - mean * a).astype(x.dtype)


def _reflect_pad(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class PConv(nn.Module):
    """ConvLayer analogue: optional nearest-up / stride-2 down, reflection
    padding, conv, optional BN, optional LeakyReLU(0.2)."""

    features: int
    kernel: int = 3
    scale: str = "none"  # none | down | up
    norm: bool = False
    act: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.scale == "up":
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        stride = 2 if self.scale == "down" else 1
        pad = (self.kernel - 1) // 2
        if pad:
            x = _reflect_pad(x, pad)
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=(stride, stride),
            padding="VALID", use_bias=not self.norm, dtype=self.dtype, name="conv",
        )(x)
        if self.norm:
            x = _bn(self, "bn", self.features, x)
        if self.act:
            x = nn.leaky_relu(x, 0.2)
        return x


class PResBlock(nn.Module):
    """Pre-activation residual block with optional down/up scaling."""

    c_in: int
    c_out: int
    scale: str = "none"

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.scale == "none" and self.c_in == self.c_out:
            identity = x
        else:
            identity = PConv(self.c_out, 3, scale=self.scale, dtype=self.dtype,
                             name="shortcut")(x)
        s1, s2 = {"down": ("none", "down"), "up": ("up", "none"),
                  "none": ("none", "none")}[self.scale]
        h = _bn(self, "preact_bn", self.c_in, x)
        h = nn.leaky_relu(h, 0.2)
        h = PConv(self.c_out, 3, scale=s1, norm=True, act=True, dtype=self.dtype,
                  name="conv1")(h)
        h = PConv(self.c_out, 3, scale=s2, dtype=self.dtype, name="conv2")(h)
        return identity + h


def _clip(c: int, lo: int = 32, hi: int = 256) -> int:
    return max(lo, min(c, hi))


class ParseNet(nn.Module):
    """512 -> 19-class parsing map + RGB reconstruction."""

    in_size: int = 512
    min_feat_size: int = 32
    base_ch: int = 64
    parsing_ch: int = 19
    res_depth: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math

        down_steps = int(math.log2(self.in_size // self.min_feat_size))
        x = PConv(self.base_ch, 3, dtype=self.dtype, name="enc_in")(x)
        ch = self.base_ch
        for i in range(down_steps):
            x = PResBlock(_clip(ch), _clip(ch * 2), scale="down",
                          dtype=self.dtype, name=f"enc_{i}")(x)
            ch *= 2
        feat = x
        for i in range(self.res_depth):
            x = PResBlock(_clip(ch), _clip(ch), dtype=self.dtype, name=f"body_{i}")(x)
        x = feat + x
        for i in range(down_steps):
            x = PResBlock(_clip(ch), _clip(ch // 2), scale="up",
                          dtype=self.dtype, name=f"dec_{i}")(x)
            ch //= 2
        out_img = PConv(3, 3, dtype=self.dtype, name="out_img")(x)
        out_mask = PConv(self.parsing_ch, 3, dtype=self.dtype, name="out_mask")(x)
        return out_mask.astype(jnp.float32), out_img.astype(jnp.float32)


class FaceParser:
    """parse_mask(face_512_bgr_uint8) -> float [512, 512] soft paste mask.

    Reproduces the reference mask pipeline
    (face_restoration_helper.py:448-470): normalize to [-1, 1] RGB, argmax
    over 19 classes, MASK_COLORMAP keep/drop per class, two 101-tap
    Gaussian blurs (sigma 11), 10-px zeroed borders, scaled to [0, 1].
    """

    MASK_COLORMAP = np.array(
        [0, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
         0, 255, 0, 0, 0], np.float32)

    def __init__(self, params, dtype=jnp.float32, in_size: int = 512,
                 res_depth: int = 10):
        self.model = ParseNet(dtype=dtype, in_size=in_size, res_depth=res_depth)
        self.in_size = in_size
        self.params = params
        self._forward = jax.jit(lambda p, x: self.model.apply({"params": p}, x)[0])

    @classmethod
    def create(cls, rng=None, dtype=jnp.float32, in_size: int = 512,
               res_depth: int = 10):
        rng = jax.random.PRNGKey(0) if rng is None else rng
        model = ParseNet(dtype=dtype, in_size=in_size, res_depth=res_depth)
        params = model.init(
            rng, jnp.zeros((1, in_size, in_size, 3), jnp.float32))["params"]
        return cls(params, dtype=dtype, in_size=in_size, res_depth=res_depth)

    def parse_mask(self, face_bgr: np.ndarray) -> np.ndarray:
        from supir_tpu.ops.resize import gaussian_blur

        face = np.asarray(face_bgr, np.float32) / 255.0
        face = face[..., ::-1]  # BGR -> RGB
        face = (face - 0.5) / 0.5
        if face.shape[0] != self.in_size or face.shape[1] != self.in_size:
            from supir_tpu.ops.resize import bilinear_resize

            face = np.asarray(bilinear_resize(
                jnp.asarray(face)[None], (self.in_size, self.in_size)))[0]
        out = jax.device_get(self._forward(self.params, face[None]))[0]
        classes = out.argmax(axis=-1)
        mask = self.MASK_COLORMAP[classes]
        mask = np.asarray(gaussian_blur(jnp.asarray(mask)[None, ..., None],
                                        ksize=101, sigma=11.0))[0, ..., 0]
        mask = np.array(gaussian_blur(jnp.asarray(mask)[None, ..., None],
                                      ksize=101, sigma=11.0))[0, ..., 0]
        thres = 10
        mask[:thres, :] = 0
        mask[-thres:, :] = 0
        mask[:, :thres] = 0
        mask[:, -thres:] = 0
        return mask / 255.0
