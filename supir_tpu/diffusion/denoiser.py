"""EDM-style denoiser preconditioning wrapper.

Reference behavior (`sgm/modules/diffusionmodules/denoiser.py`):
`DiscreteDenoiser` quantizes continuous sigma to the nearest entry of a
1000-step DDPM sigma table and feeds the *table index* to the network as the
timestep; `EpsScaling` preconditioning wraps the raw network:

    D(x, sigma) = net(x * c_in, t_idx, cond) * c_out + x * c_skip

Here the wrapper is a pure pytree (the sigma table is a constant folded into
the jitted program), and the network is any callable
`net(x, t, cond, control_scale) -> eps_prediction`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from supir_tpu.diffusion.discretization import legacy_ddpm_sigma_table
from supir_tpu.diffusion import scaling as scaling_lib

SCALINGS = {
    "eps": scaling_lib.eps_scaling,
    "edm": scaling_lib.edm_scaling,
    "v": scaling_lib.v_scaling,
}


def _append_dims(x, ndim):
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


@dataclasses.dataclass(frozen=True)
class DiscreteDenoiser:
    """Sigma-quantizing denoiser (reference DiscreteDenoiserWithControl)."""

    num_idx: int = 1000
    scaling: str = "eps"
    quantize_c_noise: bool = True
    linear_start: float = 0.00085
    linear_end: float = 0.0120

    @property
    def sigma_table(self) -> np.ndarray:
        # ascending: sigma_table[i] is the sigma of DDPM timestep i
        return legacy_ddpm_sigma_table(self.num_idx, self.linear_start, self.linear_end)

    def sigma_to_idx(self, sigma):
        table = jnp.asarray(self.sigma_table)
        dists = jnp.abs(sigma[..., None] - table)
        return jnp.argmin(dists, axis=-1)

    def idx_to_sigma(self, idx):
        return jnp.asarray(self.sigma_table)[idx]

    def __call__(
        self,
        network: Callable[..., Any],
        x: jnp.ndarray,
        sigma: jnp.ndarray,
        cond: Any,
        control_scale=1.0,
    ) -> jnp.ndarray:
        """x: [B, H, W, C] noisy latent; sigma: [B]."""
        sigma = jnp.asarray(sigma, jnp.float32)
        idx = self.sigma_to_idx(sigma)
        sigma_q = self.idx_to_sigma(idx)
        s = _append_dims(sigma_q, x.ndim)
        c_skip, c_out, c_in, c_noise = SCALINGS[self.scaling](s)
        if self.quantize_c_noise:
            t = idx.astype(jnp.float32)
        else:
            t = c_noise.reshape(sigma.shape)
        out = network(x * c_in, t, cond, control_scale)
        return out.astype(jnp.float32) * c_out + x * c_skip

    def call_cached(
        self,
        network_cached: Callable[..., Any],
        x: jnp.ndarray,
        sigma: jnp.ndarray,
        cond: Any,
        control_scale,
        cache: Any,
        recompute: jnp.ndarray,
    ):
        """Same preconditioning, but the network threads a cross-step
        feature cache: `network_cached(x, t, cond, ctrl_s, cache, recompute)
        -> (eps, cache)` (see SUPIREngine._network_cached)."""
        sigma = jnp.asarray(sigma, jnp.float32)
        idx = self.sigma_to_idx(sigma)
        sigma_q = self.idx_to_sigma(idx)
        s = _append_dims(sigma_q, x.ndim)
        c_skip, c_out, c_in, c_noise = SCALINGS[self.scaling](s)
        if self.quantize_c_noise:
            t = idx.astype(jnp.float32)
        else:
            t = c_noise.reshape(sigma.shape)
        out, cache = network_cached(x * c_in, t, cond, control_scale, cache, recompute)
        return out.astype(jnp.float32) * c_out + x * c_skip, cache
