"""Denoiser preconditioning scalings and loss weightings.

Pure functions of sigma, returning (c_skip, c_out, c_in, c_noise); the
denoiser computes `net(x * c_in, c_noise, cond) * c_out + x * c_skip`.
Behavioral contract mirrors `sgm/modules/diffusionmodules/denoiser_scaling.py`
and `denoiser_weighting.py`. SUPIR uses EpsScaling + EpsWeighting.
"""

from __future__ import annotations

import jax.numpy as jnp


def eps_scaling(sigma):
    c_skip = jnp.ones_like(sigma)
    c_out = -sigma
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    c_noise = sigma
    return c_skip, c_out, c_in, c_noise


def edm_scaling(sigma, sigma_data: float = 0.5):
    c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)
    c_out = sigma * sigma_data / jnp.sqrt(sigma**2 + sigma_data**2)
    c_in = 1.0 / jnp.sqrt(sigma**2 + sigma_data**2)
    c_noise = 0.25 * jnp.log(sigma)
    return c_skip, c_out, c_in, c_noise


def v_scaling(sigma):
    c_skip = 1.0 / (sigma**2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    c_noise = sigma
    return c_skip, c_out, c_in, c_noise


def unit_weighting(sigma):
    return jnp.ones_like(sigma)


def eps_weighting(sigma):
    return sigma**-2.0


def edm_weighting(sigma, sigma_data: float = 0.5):
    return (sigma**2 + sigma_data**2) / (sigma * sigma_data) ** 2


def v_weighting(sigma):
    return 1.0 / (1.0 + sigma**2)
