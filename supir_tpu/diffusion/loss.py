"""Diffusion training loss (reference loss.py:11-69, StandardDiffusionLoss).

loss = w(sigma) * ||D(x + n*sigma, sigma) - x||^2, sigma ~ sampler.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from supir_tpu.diffusion import scaling as scaling_lib
from supir_tpu.diffusion.sigma_sampling import discrete_sampling, edm_sampling

WEIGHTINGS = {
    "unit": scaling_lib.unit_weighting,
    "eps": scaling_lib.eps_weighting,
    "edm": scaling_lib.edm_weighting,
    "v": scaling_lib.v_weighting,
}


def diffusion_loss(
    denoise_fn: Callable[..., jnp.ndarray],
    x: jnp.ndarray,
    cond: Any,
    rng: jax.Array,
    weighting: str = "eps",
    sigma_sampler: str = "discrete",
    loss_type: str = "l2",
) -> jnp.ndarray:
    """denoise_fn(noised, sigma[B], cond) -> denoised. Returns scalar loss."""
    b = x.shape[0]
    k_sigma, k_noise = jax.random.split(rng)
    if sigma_sampler == "discrete":
        sigma, _ = discrete_sampling(k_sigma, b)
    else:
        sigma = edm_sampling(k_sigma, b)
    noise = jax.random.normal(k_noise, x.shape, x.dtype)
    sig = sigma.reshape((b,) + (1,) * (x.ndim - 1))
    noised = x + noise * sig
    denoised = denoise_fn(noised, sigma, cond)
    w = WEIGHTINGS[weighting](sig)
    if loss_type == "l2":
        per = jnp.mean(w * (denoised - x) ** 2, axis=tuple(range(1, x.ndim)))
    elif loss_type == "l1":
        per = jnp.mean(w * jnp.abs(denoised - x), axis=tuple(range(1, x.ndim)))
    else:
        raise ValueError(loss_type)
    return jnp.mean(per)
