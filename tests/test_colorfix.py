"""Color-fix numerics, golden-tested against an independent torch oracle
implementing the published formulas (wavelet pyramid / AdaIN; see
SUPIR/utils/colorfix.py in the reference for the behavioral contract)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from supir_tpu.utils.colorfix import (
    adaptive_instance_normalization,
    wavelet_blur,
    wavelet_reconstruction,
)


def _torch_wavelet_blur(image, radius):
    kernel_vals = [
        [0.0625, 0.125, 0.0625],
        [0.125, 0.25, 0.125],
        [0.0625, 0.125, 0.0625],
    ]
    kernel = torch.tensor(kernel_vals, dtype=image.dtype)[None, None]
    kernel = kernel.repeat(image.shape[1], 1, 1, 1)
    image = F.pad(image, (radius, radius, radius, radius), mode="replicate")
    return F.conv2d(image, kernel, groups=image.shape[1], dilation=radius)


def _torch_wavelet_reconstruction(content, style, levels=5):
    def decompose(img):
        high = torch.zeros_like(img)
        for i in range(levels):
            radius = 2**i
            low = _torch_wavelet_blur(img, radius)
            high = high + (img - low)
            img = low
        return high, img

    c_high, _ = decompose(content)
    _, s_low = decompose(style)
    return c_high + s_low


def _torch_adain(content, style, eps=1e-5):
    def stats(feat):
        b, c = feat.shape[:2]
        var = feat.reshape(b, c, -1).var(dim=2) + eps
        std = var.sqrt().reshape(b, c, 1, 1)
        mean = feat.reshape(b, c, -1).mean(dim=2).reshape(b, c, 1, 1)
        return mean, std

    s_mean, s_std = stats(style)
    c_mean, c_std = stats(content)
    return (content - c_mean) / c_std * s_std + s_mean


def test_wavelet_blur_matches_torch(rng):
    x = rng.standard_normal((2, 17, 23, 3)).astype(np.float32)
    for radius in (1, 2, 4):
        ours = np.asarray(wavelet_blur(jnp.asarray(x), radius))
        theirs = (
            _torch_wavelet_blur(torch.from_numpy(x).permute(0, 3, 1, 2), radius)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_wavelet_reconstruction_matches_torch(rng):
    content = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    style = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(wavelet_reconstruction(jnp.asarray(content), jnp.asarray(style)))
    theirs = (
        _torch_wavelet_reconstruction(
            torch.from_numpy(content).permute(0, 3, 1, 2),
            torch.from_numpy(style).permute(0, 3, 1, 2),
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_wavelet_self_identity(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    out = wavelet_reconstruction(x, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_adain_matches_torch(rng):
    content = rng.standard_normal((2, 24, 24, 3)).astype(np.float32) * 2 + 1
    style = rng.standard_normal((2, 24, 24, 3)).astype(np.float32) * 0.5 - 1
    ours = np.asarray(
        adaptive_instance_normalization(jnp.asarray(content), jnp.asarray(style))
    )
    theirs = (
        _torch_adain(
            torch.from_numpy(content).permute(0, 3, 1, 2),
            torch.from_numpy(style).permute(0, 3, 1, 2),
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_adain_matches_statistics(rng):
    content = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 3
    style = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.1 + 5
    out = np.asarray(
        adaptive_instance_normalization(jnp.asarray(content), jnp.asarray(style))
    )
    np.testing.assert_allclose(
        out.mean(axis=(1, 2)), style.mean(axis=(1, 2)), atol=1e-2
    )
