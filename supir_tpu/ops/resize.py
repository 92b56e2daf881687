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
