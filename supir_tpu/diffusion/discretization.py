"""Noise-level (sigma) discretizations.

TPU-first design: every schedule is computed **host-side in numpy at trace
time** and enters the compiled program as a constant table, so the sampling
loop compiles to a single `lax.scan` with no data-dependent control flow.

Behavioral contract mirrors the reference implementations
(`sgm/modules/diffusionmodules/discretizer.py:11-69` in Fanghua-Yu/SUPIR):
  - LegacyDDPM: sqrt-linear beta schedule (linear_start=0.00085,
    linear_end=0.012, 1000 steps), sigma = sqrt((1-abar)/abar), returned
    descending, with an appended terminal zero.
  - EDM/Karras: rho-7 ramp between sigma_max and sigma_min.
"""

from __future__ import annotations

import functools

import numpy as np

# max sigma of the 1000-step LegacyDDPM table; the reference hard-codes the
# rounded value 14.6146 in its linear CFG/control schedules
# (sgm/modules/diffusionmodules/sampling.py:541, guiders.py:48).
SIGMA_MAX_LEGACY = 14.6146


def roughly_equally_spaced_steps(num_substeps: int, max_step: int) -> np.ndarray:
    """Indices into a `max_step`-entry table, roughly equally spaced,
    always including the last step (reference: discretizer.py:11-14)."""
    return np.linspace(max_step - 1, 0, num_substeps, endpoint=False).astype(int)[::-1]


@functools.lru_cache(maxsize=None)
def legacy_ddpm_sigma_table(
    num_timesteps: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.0120,
) -> np.ndarray:
    """Full ascending sigma table of the DDPM sqrt-linear beta schedule.

    betas = linspace(sqrt(linear_start), sqrt(linear_end), T)**2
    sigma_t = sqrt((1 - abar_t) / abar_t)
    Returned ascending in t (sigma[0] smallest), float32, shape [T].
    """
    betas = (
        np.linspace(
            linear_start**0.5, linear_end**0.5, num_timesteps, dtype=np.float64
        )
        ** 2
    )
    alphas_cumprod = np.cumprod(1.0 - betas)
    sigmas = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)
    return sigmas.astype(np.float32)


def legacy_ddpm_sigmas(
    n: int,
    num_timesteps: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.0120,
    append_zero: bool = True,
) -> np.ndarray:
    """n-step sub-sampled LegacyDDPM schedule, descending, optionally with a
    terminal 0 appended ([n+1] floats). This is the SUPIR default schedule."""
    table = legacy_ddpm_sigma_table(num_timesteps, linear_start, linear_end)
    if n < num_timesteps:
        idx = roughly_equally_spaced_steps(n, num_timesteps)
        sel = table[idx]
    elif n == num_timesteps:
        sel = table
    else:
        raise ValueError(f"n={n} > num_timesteps={num_timesteps}")
    out = sel[::-1].astype(np.float32)  # descending
    if append_zero:
        out = np.concatenate([out, np.zeros((1,), np.float32)])
    return out


def edm_sigmas(
    n: int,
    sigma_min: float = 0.02,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    append_zero: bool = True,
) -> np.ndarray:
    """EDM (Karras) rho-schedule, descending from sigma_max to sigma_min."""
    ramp = np.linspace(0, 1, n, dtype=np.float64)
    min_inv_rho = sigma_min ** (1.0 / rho)
    max_inv_rho = sigma_max ** (1.0 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    out = sigmas.astype(np.float32)
    if append_zero:
        out = np.concatenate([out, np.zeros((1,), np.float32)])
    return out


def karras_sigmas(n: int, sigma_min: float, sigma_max: float, rho: float = 7.0) -> np.ndarray:
    """k-diffusion `get_sigmas_karras`: n descending sigmas + terminal zero.

    Used by the Restore DPM++2M (Lightning) samplers, which rebuild a Karras
    ramp between the LegacyDDPM table's extremes (sampling.py:486-494)."""
    ramp = np.linspace(0, 1, n, dtype=np.float64)
    min_inv_rho = float(sigma_min) ** (1.0 / rho)
    max_inv_rho = float(sigma_max) ** (1.0 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)
