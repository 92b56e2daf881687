"""Diffusion samplers as pure `lax.scan` programs.

Behavioral contract: `sgm/modules/diffusionmodules/sampling.py`. The
reference drives every step from Python (churn gamma, linear CFG scale,
restore-guidance cutoff, control-scale schedule are all computed per step on
the host). TPU-first redesign: **all per-step scalars are precomputed into
numpy tables at trace time** and the whole sampling loop compiles to one
`lax.scan` whose body is the (CFG-batched) network call plus a handful of
fused vector ops. No host synchronization inside the loop.

The `denoise` callable is the engine-level closure
    denoise(x, sigma_vec[B], cfg_scale[B], control_scale_scalar) -> denoised
which internally performs the 2x CFG batch duplication and combine.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.config import SamplerConfig
from supir_tpu.diffusion.discretization import (
    SIGMA_MAX_LEGACY,
    karras_sigmas,
    legacy_ddpm_sigmas,
)
from supir_tpu.diffusion.guidance import linear_cfg_scale

DenoiseFn = Callable[..., jnp.ndarray]


def _bcast(v, ndim):
    return jnp.asarray(v).reshape((-1,) + (1,) * (ndim - 1))


# ---------------------------------------------------------------------------
# step tables


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StepTables:
    """Per-step scalar schedules, all numpy float32 of length num_steps.

    Registered as a pytree so tables can be passed as *dynamic* jit
    arguments: changing cfg_scale / control_scale / restore_cfg between
    calls does not trigger recompilation (only num_steps and shapes do).
    """

    def tree_flatten(self):
        fields = tuple(f.name for f in dataclasses.fields(self))
        return tuple(getattr(self, f) for f in fields), fields

    @classmethod
    def tree_unflatten(cls, fields, children):
        return cls(**dict(zip(fields, children)))

    sigma: np.ndarray
    sigma_hat: np.ndarray
    next_sigma: np.ndarray
    churn_std: np.ndarray        # sqrt(sigma_hat^2 - sigma^2), 0 when no churn
    cfg_scale: np.ndarray        # guider scale evaluated at sigma_hat
    control_scale: np.ndarray    # per-step control strength
    restore_weight: np.ndarray   # (sigma/sigma_max)^restore_cfg, 0 where off

    @property
    def num_steps(self) -> int:
        return len(self.sigma)


def make_step_tables(
    sigmas: np.ndarray,
    cfg: SamplerConfig,
    control_scale: float = 1.0,
    use_linear_control_scale: bool = False,
    control_scale_start: float = 0.0,
) -> StepTables:
    """sigmas: descending schedule with terminal zero, length num_steps+1."""
    sig = np.asarray(sigmas, np.float64)
    n = len(sig) - 1
    sigma = sig[:-1]
    next_sigma = sig[1:]

    gamma_val = min(cfg.s_churn / max(n, 1), 2**0.5 - 1.0) if cfg.s_churn > 0 else 0.0
    in_range = (sigma >= cfg.s_tmin) & (sigma <= cfg.s_tmax)
    gamma = np.where(in_range, gamma_val, 0.0)
    sigma_hat = sigma * (gamma + 1.0)
    churn_std = np.sqrt(np.maximum(sigma_hat**2 - sigma**2, 0.0))

    if cfg.use_linear_cfg:
        cfg_scale = linear_cfg_scale(sigma_hat, cfg.cfg_scale, cfg.cfg_scale_min)
    else:
        cfg_scale = np.full(n, cfg.cfg_scale_min)

    if use_linear_control_scale:
        cs = (sigma / SIGMA_MAX_LEGACY) * (control_scale_start - control_scale) + control_scale
    else:
        cs = np.full(n, control_scale)

    restore_on = (next_sigma > cfg.restore_cfg_s_tmin) & (cfg.restore_cfg > 0)
    with np.errstate(divide="ignore"):
        rw = np.where(restore_on, (sigma / SIGMA_MAX_LEGACY) ** max(cfg.restore_cfg, 0.0), 0.0)

    f32 = lambda a: np.asarray(a, np.float32)
    return StepTables(
        sigma=f32(sigma),
        sigma_hat=f32(sigma_hat),
        next_sigma=f32(next_sigma),
        churn_std=f32(churn_std),
        cfg_scale=f32(cfg_scale),
        control_scale=f32(cs),
        restore_weight=f32(rw),
    )


def prepare_x(x: jnp.ndarray, sigmas: np.ndarray) -> jnp.ndarray:
    """x *= sqrt(1 + sigma_0^2) (BaseDiffusionSampler.prepare_sampling_loop)."""
    return x * np.sqrt(1.0 + float(sigmas[0]) ** 2)


def _to_d(x, sigma, denoised):
    return (x - denoised) / _bcast(sigma, x.ndim)


def _ancestral_step_sigmas(sigma_from, sigma_to, eta):
    """(sigma_down, sigma_up) per k-diffusion (sampling_utils.py:27-36).

    jnp ops so it works on both concrete numpy tables and traced arrays."""
    sigma_from = jnp.asarray(sigma_from)
    sigma_to = jnp.asarray(sigma_to)
    if eta == 0:
        return sigma_to, jnp.zeros_like(sigma_to)
    up = jnp.minimum(
        sigma_to,
        eta
        * jnp.sqrt(
            sigma_to**2
            * (sigma_from**2 - sigma_to**2)
            / jnp.maximum(sigma_from**2, 1e-20)
        ),
    )
    up = jnp.where(sigma_from > 0, up, 0.0)
    down = jnp.sqrt(jnp.maximum(sigma_to**2 - up**2, 0.0))
    return down, up


# ---------------------------------------------------------------------------
# RestoreEDM — the SUPIR default sampler (sampling.py:528-597)


def restore_edm_sample(
    denoise: DenoiseFn,
    x: jnp.ndarray,
    rng: jax.Array,
    tables: StepTables,
    x_center: Optional[jnp.ndarray] = None,
    s_noise: float = 1.003,
) -> jnp.ndarray:
    """Euler EDM with churn noise injection and restoration guidance toward
    the stage-1 latent x_center."""
    b = x.shape[0]
    n = tables.num_steps
    keys = jax.random.split(rng, n)
    xs = (
        jnp.asarray(tables.sigma),
        jnp.asarray(tables.sigma_hat),
        jnp.asarray(tables.next_sigma),
        jnp.asarray(tables.churn_std),
        jnp.asarray(tables.cfg_scale),
        jnp.asarray(tables.control_scale),
        jnp.asarray(tables.restore_weight),
        keys,
    )
    xc = jnp.zeros_like(x) if x_center is None else x_center

    def step(x, scan_in):
        sigma, sigma_hat, next_sigma, churn_std, cfg_s, ctrl_s, rw, key = scan_in
        eps = jax.random.normal(key, x.shape, x.dtype) * s_noise
        x = x + eps * churn_std
        sig_b = jnp.full((b,), sigma_hat)
        cfg_b = jnp.full((b,), cfg_s)
        denoised = denoise(x, sig_b, cfg_b, ctrl_s)
        denoised = denoised - (denoised - xc) * rw
        d = (x - denoised) / sigma_hat
        x = x + d * (next_sigma - sigma_hat)
        return x, None

    x, _ = jax.lax.scan(step, x, xs)
    return x


def restore_edm_sample_cached(
    denoise_cached,
    cache0,
    recompute: jnp.ndarray,
    x: jnp.ndarray,
    rng: jax.Array,
    tables: StepTables,
    x_center: Optional[jnp.ndarray] = None,
    s_noise: float = 1.003,
) -> jnp.ndarray:
    """RestoreEDM with cross-step feature caching (opt-in approximation).

    `denoise_cached(x, sigma_b, cfg_b, ctrl_s, cache, recompute_i)` returns
    (denoised, cache); on steps where `recompute[i]` is False it reuses the
    encoder/control features captured at the last recompute step
    (DeepCache / encoder-propagation style — the UNet encoder, middle and
    control pyramid change slowly across adjacent sigmas, so only the
    decoder + adapters re-run). recompute[0] must be True. With
    recompute all-True the output is bit-identical to
    `restore_edm_sample` (tested)."""
    b = x.shape[0]
    n = tables.num_steps
    keys = jax.random.split(rng, n)
    xs = (
        jnp.asarray(tables.sigma),
        jnp.asarray(tables.sigma_hat),
        jnp.asarray(tables.next_sigma),
        jnp.asarray(tables.churn_std),
        jnp.asarray(tables.cfg_scale),
        jnp.asarray(tables.control_scale),
        jnp.asarray(tables.restore_weight),
        jnp.asarray(recompute),
        keys,
    )
    xc = jnp.zeros_like(x) if x_center is None else x_center

    def step(carry, scan_in):
        x, cache = carry
        (sigma, sigma_hat, next_sigma, churn_std, cfg_s, ctrl_s, rw, rec,
         key) = scan_in
        eps = jax.random.normal(key, x.shape, x.dtype) * s_noise
        x = x + eps * churn_std
        sig_b = jnp.full((b,), sigma_hat)
        cfg_b = jnp.full((b,), cfg_s)
        denoised, cache = denoise_cached(x, sig_b, cfg_b, ctrl_s, cache, rec)
        denoised = denoised - (denoised - xc) * rw
        d = (x - denoised) / sigma_hat
        x = x + d * (next_sigma - sigma_hat)
        return (x, cache), None

    (x, _), _ = jax.lax.scan(step, (x, cache0), xs)
    return x


# ---------------------------------------------------------------------------
# Euler / Heun EDM (sampling.py:86-136, 216-240)


def euler_edm_sample(denoise, x, rng, tables, s_noise=1.0):
    return restore_edm_sample(denoise, x, rng, tables, x_center=None, s_noise=s_noise)


def heun_edm_sample(denoise, x, rng, tables, s_noise=1.0):
    b = x.shape[0]
    n = tables.num_steps
    keys = jax.random.split(rng, n)
    xs = (
        jnp.asarray(tables.sigma_hat),
        jnp.asarray(tables.next_sigma),
        jnp.asarray(tables.churn_std),
        jnp.asarray(tables.cfg_scale),
        jnp.asarray(tables.control_scale),
        keys,
    )

    def step(x, scan_in):
        sigma_hat, next_sigma, churn_std, cfg_s, ctrl_s, key = scan_in
        eps = jax.random.normal(key, x.shape, x.dtype) * s_noise
        x = x + eps * churn_std
        sig_b = jnp.full((b,), sigma_hat)
        cfg_b = jnp.full((b,), cfg_s)
        denoised = denoise(x, sig_b, cfg_b, ctrl_s)
        d = (x - denoised) / sigma_hat
        dt = next_sigma - sigma_hat
        x_euler = x + d * dt

        def correction(_):
            den2 = denoise(x_euler, jnp.full((b,), next_sigma), cfg_b, ctrl_s)
            d2 = (x_euler - den2) / next_sigma
            return x + (d + d2) / 2.0 * dt

        x = jax.lax.cond(next_sigma > 1e-14, correction, lambda _: x_euler, None)
        return x, None

    x, _ = jax.lax.scan(step, x, xs)
    return x


# ---------------------------------------------------------------------------
# Ancestral samplers (sampling.py:138-175, 243-289)


def euler_ancestral_sample(denoise, x, rng, tables, eta=1.0, s_noise=1.0):
    b = x.shape[0]
    n = tables.num_steps
    down, up = _ancestral_step_sigmas(tables.sigma, tables.next_sigma, eta)
    keys = jax.random.split(rng, n)
    xs = (
        jnp.asarray(tables.sigma),
        jnp.asarray(tables.next_sigma),
        jnp.asarray(down.astype(np.float32)),
        jnp.asarray(up.astype(np.float32)),
        jnp.asarray(tables.cfg_scale),
        jnp.asarray(tables.control_scale),
        keys,
    )

    def step(x, scan_in):
        sigma, next_sigma, s_down, s_up, cfg_s, ctrl_s, key = scan_in
        denoised = denoise(x, jnp.full((b,), sigma), jnp.full((b,), cfg_s), ctrl_s)
        d = (x - denoised) / sigma
        x = x + d * (s_down - sigma)
        noise = jax.random.normal(key, x.shape, x.dtype)
        x = jnp.where(next_sigma > 0.0, x + noise * s_noise * s_up, x)
        return x, None

    x, _ = jax.lax.scan(step, x, xs)
    return x


def dpmpp2s_ancestral_sample(denoise, x, rng, tables, eta=1.0, s_noise=1.0):
    b = x.shape[0]
    n = tables.num_steps
    down, up = _ancestral_step_sigmas(tables.sigma, tables.next_sigma, eta)
    keys = jax.random.split(rng, n)
    xs = (
        jnp.asarray(tables.sigma),
        jnp.asarray(tables.next_sigma),
        jnp.asarray(down.astype(np.float32)),
        jnp.asarray(up.astype(np.float32)),
        jnp.asarray(tables.cfg_scale),
        jnp.asarray(tables.control_scale),
        keys,
    )

    def step(x, scan_in):
        sigma, next_sigma, s_down, s_up, cfg_s, ctrl_s, key = scan_in
        cfg_b = jnp.full((b,), cfg_s)
        denoised = denoise(x, jnp.full((b,), sigma), cfg_b, ctrl_s)
        d = (x - denoised) / sigma
        x_euler = x + d * (s_down - sigma)

        def dpm_branch(_):
            t = -jnp.log(sigma)
            t_next = -jnp.log(s_down)
            h = t_next - t
            s = t + 0.5 * h
            sig_s = jnp.exp(-s)
            x2 = (sig_s / sigma) * x - jnp.expm1(-0.5 * h) * denoised
            den2 = denoise(x2, jnp.full((b,), sig_s), cfg_b, ctrl_s)
            return (s_down / sigma) * x - jnp.expm1(-h) * den2

        x = jax.lax.cond(s_down > 1e-14, dpm_branch, lambda _: x_euler, None)
        noise = jax.random.normal(key, x.shape, x.dtype)
        x = jnp.where(next_sigma > 0.0, x + noise * s_noise * s_up, x)
        return x, None

    x, _ = jax.lax.scan(step, x, xs)
    return x


# ---------------------------------------------------------------------------
# DPM++ 2M family (sampling.py:293-368, 422-519)


def vbt_value(key, t, t0, t1, shape, dtype=jnp.float32, levels: int = 24):
    """Virtual Brownian tree: W(t) for a Brownian motion pinned to W(t0)=0,
    W(t1)~N(0, t1-t0), evaluated by `levels` steps of Brownian-bridge
    bisection with deterministic key-splitting (the "Scalable Gradients for
    SDEs" construction, same idea as torchsde's BrownianTree that backs
    k-diffusion's BrownianTreeNoiseSampler, reference sampling.py:486-494).

    Deterministic in (key, t): querying the same time from the same key gives
    the same value no matter what other times are queried — this is the
    property that makes SDE sampling reproducible across step counts.
    Resolution: |t1-t0| * 2^-levels.
    """
    w0 = jnp.zeros(shape, dtype)
    span = t1 - t0
    w1 = jax.random.normal(jax.random.fold_in(key, 1), shape, dtype) * jnp.sqrt(span)
    tiny = jnp.asarray(1e-30, dtype)

    def body(_, carry):
        k, ta, tb, wa, wb = carry
        tm = 0.5 * (ta + tb)
        km = jax.random.fold_in(k, 2)
        # Brownian bridge midpoint: mean of endpoints + N(0, (tb-ta)/4)
        wm = 0.5 * (wa + wb) + jax.random.normal(km, shape, dtype) * jnp.sqrt(
            jnp.maximum(tb - ta, 0.0) / 4.0
        )
        go_left = t < tm
        k = jax.random.fold_in(k, jnp.where(go_left, 3, 4))
        ta2 = jnp.where(go_left, ta, tm)
        tb2 = jnp.where(go_left, tm, tb)
        wa2 = jnp.where(go_left, wa, wm)
        wb2 = jnp.where(go_left, wm, wb)
        return k, ta2, tb2, wa2, wb2

    k, ta, tb, wa, wb = jax.lax.fori_loop(
        0, levels, body, (key, jnp.asarray(t0, dtype), jnp.asarray(t1, dtype), w0, w1)
    )
    frac = (t - ta) / jnp.maximum(tb - ta, tiny)
    return wa + (wb - wa) * jnp.clip(frac, 0.0, 1.0)


def brownian_increment(key, sigma_from, sigma_to, sigma_min, sigma_max, shape,
                       dtype=jnp.float32, levels: int = 24):
    """BrownianTreeNoiseSampler.__call__ equivalent: unit-variance noise
    (W(t1)-W(t0)) / sqrt(|t1-t0|) on the global span [sigma_min, sigma_max]
    (k-diffusion uses identity transform, so t == sigma)."""
    lo = jnp.minimum(sigma_from, sigma_to)
    hi = jnp.maximum(sigma_from, sigma_to)
    w_hi = vbt_value(key, hi, sigma_min, sigma_max, shape, dtype, levels)
    w_lo = vbt_value(key, lo, sigma_min, sigma_max, shape, dtype, levels)
    return (w_hi - w_lo) / jnp.sqrt(jnp.maximum(hi - lo, 1e-30))


def dpmpp2m_sample(denoise, x, rng, tables, eta: float = 0.0, s_noise: float = 1.0,
                   brownian: bool = True):
    """DPM++(2M), optionally SDE (eta>0) — covers both the plain
    DPMPP2MSampler and RestoreDPMPP2MSampler step math
    (reference sampling.py:293-368, 422-519).

    Parity notes vs the reference RestoreDPMPP2MSampler:
      - step 0 (old_denoised is None) and terminal steps (next_sigma≈0)
        return x_standard with NO noise injection (sampling.py:471-474);
      - with eta>0, the SDE noise comes from the Brownian-tree sampler over
        the global [sigmas_min, sigmas_max] span (sampling.py:494-499), so
        sampling is reproducible across step counts; set brownian=False for
        plain i.i.d. increments (distribution-identical for a fixed
        schedule, cheaper).
    """
    b = x.shape[0]
    n = tables.num_steps
    keys = jax.random.split(rng, n)
    sig = jnp.asarray(tables.sigma)
    prev_sigma = jnp.concatenate([jnp.ones((1,), sig.dtype), sig[:-1]])
    step_idx = np.arange(n, dtype=np.int32)
    # global Brownian span: sigmas_min = last nonzero sigma, sigmas_max = first
    # (traced scalars — tables are dynamic jit args)
    bt_min = sig[-1]
    bt_max = sig[0]
    xs = (
        jnp.asarray(step_idx),
        prev_sigma,
        jnp.asarray(tables.sigma),
        jnp.asarray(tables.next_sigma),
        jnp.asarray(tables.cfg_scale),
        jnp.asarray(tables.control_scale),
        keys,
    )

    def step(carry, scan_in):
        x, old_denoised = carry
        i, p_sigma, sigma, next_sigma, cfg_s, ctrl_s, key = scan_in
        cfg_b = jnp.full((b,), cfg_s)
        denoised = denoise(x, jnp.full((b,), sigma), cfg_b, ctrl_s)

        t = -jnp.log(sigma)
        t_next = -jnp.log(jnp.maximum(next_sigma, 1e-20))
        h = t_next - t
        eta_h = eta * h
        mult1 = (next_sigma / sigma) * jnp.exp(-eta_h)
        mult2 = jnp.expm1(-h - eta_h)
        x_standard = mult1 * x - mult2 * denoised

        h_last = t - (-jnp.log(p_sigma))
        r = h_last / h
        denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
        x_advanced = mult1 * x - mult2 * denoised_d

        use_advanced = (i > 0) & (next_sigma > 1e-14)
        x = jnp.where(use_advanced, x_advanced, x_standard)
        if eta > 0:
            if brownian:
                noise = brownian_increment(
                    rng, sigma, next_sigma, bt_min, bt_max, x.shape, x.dtype
                )
            else:
                noise = jax.random.normal(key, x.shape, x.dtype)
            std = next_sigma * jnp.sqrt(-jnp.expm1(-2.0 * eta_h)) * s_noise
            # reference: no noise on step 0 (early return) or terminal steps
            x = jnp.where((i > 0) & (next_sigma > 1e-14), x + noise * std, x)
        return (x, denoised), None

    (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)), xs)
    return x


def restore_dpmpp2m_tables(cfg: SamplerConfig, num_steps: int, **control_kw) -> StepTables:
    """The Restore DPM++2M samplers rebuild a Karras ramp between the
    LegacyDDPM extremes (sampling.py:486-494)."""
    base = legacy_ddpm_sigmas(num_steps)
    sigmas = karras_sigmas(num_steps, float(base[-2]), float(base[0]))
    return make_step_tables(sigmas, cfg, **control_kw)


# ---------------------------------------------------------------------------
# Linear multistep (sampling.py:178-214)


def lms_sample(denoise, x, rng, tables, order: int = 4):
    """LMS with Adams-Bashforth coefficients precomputed host-side from the
    sigma schedule (scipy quad, reference sampling_utils.py:12-24)."""
    from scipy import integrate

    n = tables.num_steps
    sig = np.concatenate([tables.sigma, [tables.next_sigma[-1]]]).astype(np.float64)

    def lms_coeff(ord_, i, j):
        def fn(tau):
            prod = 1.0
            for k in range(ord_):
                if j == k:
                    continue
                prod *= (tau - sig[i - k]) / (sig[i - j] - sig[i - k])
            return prod

        return integrate.quad(fn, sig[i], sig[i + 1], epsrel=1e-4)[0]

    # coeff_table[i, j]: weight of ds[-1-j] at step i (0 when j >= cur_order)
    coeff_table = np.zeros((n, order), np.float32)
    for i in range(n):
        cur = min(i + 1, order)
        for j in range(cur):
            coeff_table[i, j] = lms_coeff(cur, i, j)

    b = x.shape[0]
    xs = (
        jnp.asarray(np.arange(n, dtype=np.int32)),
        jnp.asarray(tables.sigma),
        jnp.asarray(tables.cfg_scale),
        jnp.asarray(tables.control_scale),
        jnp.asarray(coeff_table),
    )

    def step(carry, scan_in):
        x, ds = carry  # ds: [order, ...] ring of derivatives, newest at 0
        i, sigma, cfg_s, ctrl_s, coeffs = scan_in
        denoised = denoise(x, jnp.full((b,), sigma), jnp.full((b,), cfg_s), ctrl_s)
        d = (x - denoised) / sigma
        ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
        x = x + jnp.tensordot(coeffs, ds, axes=1)
        return (x, ds), None

    ds0 = jnp.zeros((order,) + x.shape, x.dtype)
    (x, _), _ = jax.lax.scan(step, (x, ds0), xs)
    return x


# ---------------------------------------------------------------------------
# Substep sampler (sampling.py:372-419): EulerAncestral on a fixed subset


SUBSTEP_SUBSET = (0, 100, 200, 300, 1000)


def substep_sigmas(n_sample_steps: int) -> np.ndarray:
    full = legacy_ddpm_sigmas(1000)  # 1001 entries descending w/ zero
    idx = list(SUBSTEP_SUBSET[:n_sample_steps]) + [SUBSTEP_SUBSET[-1]]
    return full[np.asarray(idx)]
