"""Image quality metrics for the eval harness (RealPhoto60 parity,
BASELINE.md): PSNR, SSIM, and LPIPS.

LPIPS mirrors the reference's perceptual net (`sgm/modules/autoencoding/
lpips/loss/lpips.py`: VGG16 feature slices, unit-normalized channel
differences, learned 1x1 weightings). The VGG16 + linear-head weights must
be provided via the converter (no network egress here); without them
`lpips_available()` is False and eval falls back to PSNR/SSIM only.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    """[B,H,W,C] in [-1,1] by default; returns per-image PSNR in dB."""
    mse = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    """Gaussian-window SSIM (standard 11x11 sigma 1.5), per image."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    r = np.arange(11) - 5
    g = np.exp(-(r**2) / (2 * 1.5**2))
    g = (g / g.sum()).astype(np.float32)
    kern = jnp.asarray(np.outer(g, g))[:, :, None, None]

    def filt(x):
        c = x.shape[-1]
        k = jnp.tile(kern, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    mu_a, mu_b = filt(a), filt(b)
    saa = filt(a * a) - mu_a**2
    sbb = filt(b * b) - mu_b**2
    sab = filt(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (saa + sbb + c2)
    )
    return jnp.mean(s, axis=(1, 2, 3))


# --------------------------------------------------------------------------
# LPIPS (VGG16 slices + learned linear heads)

VGG_SLICES = (2, 2, 3, 3, 3)  # conv counts per slice (vgg16 relu1_2..relu5_3)
VGG_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk emitting the 5 LPIPS feature slices."""

    @nn.compact
    def __call__(self, x):
        feats = []
        ch = 64
        conv_i = 0
        for s, (n, ch) in enumerate(zip(VGG_SLICES, VGG_CHANNELS)):
            for i in range(n):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
            feats.append(x)
            if s < 4:
                x = nn.max_pool(x, (2, 2), (2, 2))
        return feats


class LPIPS(nn.Module):
    """Perceptual distance: sum_l mean(w_l * ||norm(f_l(a)) - norm(f_l(b))||^2)."""

    @nn.compact
    def __call__(self, a, b):
        def scale(x):
            return (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)

        vgg = VGG16Features(name="vgg")
        fa = vgg(scale(a))
        fb = vgg(scale(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.maximum(jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10)
            nb = xb / jnp.maximum(jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10)
            diff = (na - nb) ** 2
            w = self.param(f"lin_{i}", nn.initializers.ones, (1, 1, 1, diff.shape[-1]))
            total = total + jnp.mean(jnp.sum(diff * jnp.maximum(w, 0.0), axis=-1), axis=(1, 2))
        return total


_lpips_params = None

# torchvision vgg16 `features` Sequential indices of the 13 convs; the
# slice boundaries (reference lpips.py:109-119: 0-3 / 4-8 / 9-15 / 16-22 /
# 23-29) put maxpools at 4, 9, 16, 23 — matching VGG16Features' pool-after-
# slice ordering
VGG_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_lpips_state(vgg_sd: dict, lin_sd: dict) -> dict:
    """(torchvision vgg16 state dict, vgg_lpips/`vgg.pth` lin checkpoint)
    -> flax LPIPS params tree.

    The reference builds its perceptual net from torchvision's pretrained
    vgg16 `features` plus the taming `vgg.pth` linear heads
    (lpips.py:16-31: `vgg16(pretrained=True)` + strict=False load of
    lin{0..4}.model.1.weight). Raises on any missing key; ignores
    classifier.* / scaling_layer.* extras."""
    params: dict = {"vgg": {}}
    for i, t in enumerate(VGG_TORCH_CONV_IDX):
        w = np.asarray(vgg_sd[f"features.{t}.weight"], np.float32)
        b = np.asarray(vgg_sd[f"features.{t}.bias"], np.float32)
        params["vgg"][f"conv_{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    for i in range(5):
        w = np.asarray(lin_sd[f"lin{i}.model.1.weight"], np.float32)  # [1,C,1,1]
        params[f"lin_{i}"] = jnp.asarray(w.transpose(0, 2, 3, 1))
    return params


def load_lpips_from_torch(vgg_path: str, lin_path: str):
    """Load LPIPS weights from the reference's own sources: a torchvision
    vgg16 checkpoint + the taming `vgg.pth` linear heads."""
    from supir_tpu.utils.ckpt import load_torch_file

    global _lpips_params
    _lpips_params = convert_lpips_state(
        load_torch_file(vgg_path), load_torch_file(lin_path)
    )


def load_lpips_params(path: str):
    """Load converted VGG+linear weights (pickle of the flax tree)."""
    global _lpips_params
    import pickle

    with open(path, "rb") as f:
        _lpips_params = pickle.load(f)


def lpips_available() -> bool:
    return _lpips_params is not None


def lpips(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    if _lpips_params is None:
        raise RuntimeError("LPIPS weights not loaded; call load_lpips_params")
    return LPIPS().apply({"params": _lpips_params}, a, b)
