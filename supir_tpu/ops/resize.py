"""Image resizing ops (NHWC), jit-friendly wrappers over jax.image.

Replaces the reference's mix of torch interpolate / PIL bicubic / cv2
Lanczos (SUPIR/util.py:60-150) with XLA-native resizes. Lanczos-3 stands in
for cv2.INTER_LANCZOS4 (kernel support 3 vs 4 — visually equivalent for the
x2-x8 upscales used here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _resize(x, size, method, antialias):
    n, h, w, c = x.shape
    return jax.image.resize(
        x, (n, size[0], size[1], c), method=method, antialias=antialias
    )


def bilinear_resize(x, size, antialias=False):
    return _resize(x, size, "bilinear", antialias)


def bicubic_resize(x, size, antialias=False):
    return _resize(x, size, "bicubic", antialias)


def lanczos_resize(x, size):
    return _resize(x, size, "lanczos3", True)


def nearest_resize(x, size):
    return _resize(x, size, "nearest", False)


def gaussian_blur(x, ksize: int, sigma: float):
    """Separable Gaussian blur over NHWC (cv2.GaussianBlur semantics:
    odd ksize, reflect-101 border). Used by the face paste-back soft-mask
    pipeline (reference face_restoration_helper.py:464-466)."""
    assert ksize % 2 == 1, "kernel size must be odd"
    half = ksize // 2
    t = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (t / sigma) ** 2)
    k = k / k.sum()
    pad = [(0, 0), (half, half), (0, 0), (0, 0)]
    xp = jnp.pad(x, pad, mode="reflect")
    # depthwise 1-D convs via dot over a gathered window would materialize
    # ksize copies; correlate along each axis with lax.conv instead
    c = x.shape[-1]
    kh = jnp.tile(k.reshape(ksize, 1, 1, 1), (1, 1, 1, c))
    y = jax.lax.conv_general_dilated(
        xp, kh, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    yp = jnp.pad(y, [(0, 0), (0, 0), (half, half), (0, 0)], mode="reflect")
    kw = jnp.tile(k.reshape(1, ksize, 1, 1), (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        yp, kw, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
