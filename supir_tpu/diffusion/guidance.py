"""Classifier-free guidance.

The reference guiders (`sgm/modules/diffusionmodules/guiders.py`) duplicate
the batch (uncond|cond) before the network call and split after. We keep the
same 2x-batch strategy — it doubles the matmul batch dimension, which is
exactly what the MXU wants — but the *scale schedule* becomes a per-step
constant computed at trace time, so LinearCFG costs nothing inside the scan.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from supir_tpu.diffusion.discretization import SIGMA_MAX_LEGACY


def vanilla_cfg_scale(sigma, scale: float):
    """Constant CFG scale (reference VanillaCFG)."""
    return np.broadcast_to(np.float32(scale), np.shape(sigma)).copy() if isinstance(
        sigma, np.ndarray
    ) else jnp.full_like(jnp.asarray(sigma, jnp.float32), scale)


def linear_cfg_scale(sigma, scale: float, scale_min: float | None = None):
    """Linear-in-sigma CFG scale (reference LinearCFG, guiders.py:44-63):
    scale(sigma) = (scale - scale_min) * sigma / 14.6146 + scale_min.

    Accepts numpy (trace-time schedule precomputation) or jax arrays.
    """
    if scale_min is None:
        scale_min = scale
    return (scale - scale_min) * sigma / SIGMA_MAX_LEGACY + scale_min


def cfg_combine(denoised_uc, denoised_c, scale):
    """uncond + scale * (cond - uncond); scale broadcast over batch."""
    scale = jnp.asarray(scale, denoised_c.dtype)
    scale = scale.reshape((-1,) + (1,) * (denoised_c.ndim - 1))
    return denoised_uc + scale * (denoised_c - denoised_uc)
