"""Host-side image I/O and geometry (behavioral contract: SUPIR/util.py:60-170).

Arrays are NHWC float32 in [-1, 1] on the JAX side; helpers here run on the
host (numpy/PIL/cv2) exactly like the reference so the round-to-64 /
min-size geometry matches bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from PIL import Image


def pil_to_array(
    img: Image.Image,
    upscale: float = 1.0,
    min_size: int = 1024,
    fix_resize: Optional[int] = None,
    gamma: float = 1.0,
) -> Tuple[np.ndarray, int, int]:
    """PIL -> [H, W, 3] float32 in [-1, 1]; returns (arr, h0, w0) where
    (h0, w0) is the pre-rounding target size (PIL2Tensor, SUPIR/util.py:60).

    gamma: input gamma correction applied in [0, 1] uint8 domain after the
    resize, `(x/255)**gamma` re-quantized to uint8 — the Gamma Correction
    slider of the reference UI (gradio_demo.py:112-115, :69-71)."""
    w, h = img.size
    w *= upscale
    h *= upscale
    w0, h0 = round(w), round(h)
    if min(w, h) < min_size:
        s = min_size / min(w, h)
        w *= s
        h *= s
    if fix_resize is not None:
        s = fix_resize / min(w, h)
        w *= s
        h *= s
        w0, h0 = round(w), round(h)
    w = int(np.round(w / 64.0)) * 64
    h = int(np.round(h / 64.0)) * 64
    x = img.resize((w, h), Image.BICUBIC)
    x = np.array(x).round().clip(0, 255).astype(np.uint8)
    if gamma != 1.0:
        g = np.power(x.astype(np.float32) / 255.0, gamma) * 255.0
        x = g.round().clip(0, 255).astype(np.uint8)
    x = x.astype(np.float32) / 255.0 * 2.0 - 1.0
    return x, h0, w0


def array_to_pil(x: np.ndarray, h0: Optional[int] = None, w0: Optional[int] = None) -> Image.Image:
    """[H, W, 3] in [-1, 1] -> PIL, bicubic-restored to (h0, w0)."""
    import jax
    import jax.numpy as jnp

    if h0 is not None and w0 is not None and (x.shape[0] != h0 or x.shape[1] != w0):
        x = np.asarray(
            jax.image.resize(jnp.asarray(x)[None], (1, h0, w0, x.shape[2]), "bicubic")[0]
        )
    x = (np.asarray(x) * 127.5 + 127.5).clip(0, 255).astype(np.uint8)
    return Image.fromarray(x)


def hwc3(x: np.ndarray) -> np.ndarray:
    """Grayscale/alpha -> 3-channel (HWC3, SUPIR/util.py:97)."""
    assert x.dtype == np.uint8
    if x.ndim == 2:
        x = x[:, :, None]
    h, w, c = x.shape
    if c == 3:
        return x
    if c == 1:
        return np.concatenate([x, x, x], axis=2)
    if c == 4:
        color = x[:, :, 0:3].astype(np.float32)
        alpha = x[:, :, 3:4].astype(np.float32) / 255.0
        y = color * alpha + 255.0 * (1.0 - alpha)
        return y.clip(0, 255).astype(np.uint8)
    raise ValueError(f"bad channel count {c}")


def upscale_image(
    x: np.ndarray, upscale: float, min_size: Optional[int] = None, unit_resolution: int = 64
) -> np.ndarray:
    """uint8 HWC upscale with round-to-unit (upscale_image, SUPIR/util.py:116)."""
    h, w, _ = x.shape
    hf, wf = float(h) * upscale, float(w) * upscale
    if min_size is not None and min(hf, wf) < min_size:
        s = min_size / min(wf, hf)
        wf *= s
        hf *= s
    h2 = int(np.round(hf / unit_resolution)) * unit_resolution
    w2 = int(np.round(wf / unit_resolution)) * unit_resolution
    interp = cv2.INTER_LANCZOS4 if upscale > 1 else cv2.INTER_AREA
    img = cv2.resize(x, (w2, h2), interpolation=interp)
    return img.round().clip(0, 255).astype(np.uint8)


def fix_resize(x: np.ndarray, size: int = 512, unit_resolution: int = 64) -> np.ndarray:
    h, w, _ = x.shape
    s = size / min(h, w)
    h2 = int(np.round(h * s / unit_resolution)) * unit_resolution
    w2 = int(np.round(w * s / unit_resolution)) * unit_resolution
    interp = cv2.INTER_LANCZOS4 if s > 1 else cv2.INTER_AREA
    img = cv2.resize(x, (w2, h2), interpolation=interp)
    return img.round().clip(0, 255).astype(np.uint8)
