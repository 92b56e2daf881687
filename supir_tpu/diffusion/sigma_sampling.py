"""Training-time sigma samplers (reference sigma_sampling.py:6-41)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from supir_tpu.diffusion.discretization import legacy_ddpm_sigma_table


def edm_sampling(rng, n, p_mean: float = -1.2, p_std: float = 1.2):
    """Lognormal sigma draw (EDM training distribution)."""
    return jnp.exp(p_mean + p_std * jax.random.normal(rng, (n,)))


def discrete_sampling(rng, n, num_idx: int = 1000, idx_low: int = 0, idx_high: int | None = None):
    """Uniform timestep index -> table sigma (DDPM-style training)."""
    hi = num_idx if idx_high is None else idx_high
    idx = jax.random.randint(rng, (n,), idx_low, hi)
    table = jnp.asarray(legacy_ddpm_sigma_table(num_idx))
    return table[idx], idx
