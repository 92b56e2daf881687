"""Sampler math tests with analytic denoisers (no network).

Key invariant: with a perfect denoiser D(x, sigma) = target, every sampler
must land exactly on `target` (the ODE contracts (x - target) by
sigma_next/sigma each step, and the final sigma is 0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supir_tpu.config import SamplerConfig
from supir_tpu.diffusion import samplers as S
from supir_tpu.diffusion.discretization import legacy_ddpm_sigmas

SHAPE = (2, 8, 8, 4)


def perfect_denoise(target):
    def d(x, sigma_b, cfg_b, ctrl_s):
        return jnp.broadcast_to(target, x.shape)

    return d


def _tables(num_steps=5, **kw):
    cfg = SamplerConfig(**kw) if kw else SamplerConfig(s_churn=0.0, restore_cfg=0.0)
    sigmas = legacy_ddpm_sigmas(num_steps)
    return S.make_step_tables(sigmas, cfg), sigmas


@pytest.mark.parametrize(
    "sampler,kw",
    [
        (S.restore_edm_sample, dict(s_noise=0.0)),
        (S.euler_edm_sample, {}),
        (S.heun_edm_sample, {}),
        (S.euler_ancestral_sample, dict(eta=1.0, s_noise=0.0)),
        (S.dpmpp2s_ancestral_sample, dict(eta=1.0, s_noise=0.0)),
        (S.dpmpp2m_sample, {}),
        (S.lms_sample, {}),
    ],
)
def test_perfect_denoiser_converges(sampler, kw):
    tables, sigmas = _tables(5)
    target = jnp.full(SHAPE, 0.7)
    x0 = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    x0 = S.prepare_x(x0, sigmas)
    out = sampler(perfect_denoise(target), x0, jax.random.PRNGKey(1), tables, **kw)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-3)


def test_restore_edm_single_step_closed_form():
    """One Euler step with zero denoiser: x1 = x0 * sigma1/sigma0."""
    tables, sigmas = _tables(2)
    tables_1 = S.StepTables(*[np.asarray(v[:1]) for v in (
        tables.sigma, tables.sigma_hat, tables.next_sigma, tables.churn_std,
        tables.cfg_scale, tables.control_scale, tables.restore_weight)])
    x0 = jnp.full(SHAPE, 3.0)
    zero_den = lambda x, s, c, cs: jnp.zeros_like(x)
    out = S.restore_edm_sample(zero_den, x0, jax.random.PRNGKey(0), tables_1, s_noise=0.0)
    expected = 3.0 * tables.next_sigma[0] / tables.sigma_hat[0]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_restore_guidance_pulls_to_center():
    """With restore weight ~1 at every step, denoised is replaced by
    x_center, so the sampler converges to x_center instead of target."""
    cfg = SamplerConfig(s_churn=0.0, restore_cfg=1e-6, restore_cfg_s_tmin=-1.0)
    sigmas = legacy_ddpm_sigmas(5)
    tables = S.make_step_tables(sigmas, cfg)
    # (sigma/sigma_max)^eps ~ 1 for all sigma>0; last step has rw=0 only if
    # next_sigma <= tmin, which we disabled via tmin=-1 -> check table
    assert np.all(tables.restore_weight > 0.999)
    target = jnp.full(SHAPE, 0.9)
    center = jnp.full(SHAPE, -0.4)
    x0 = S.prepare_x(jnp.zeros(SHAPE), sigmas)
    out = S.restore_edm_sample(
        perfect_denoise(target), x0, jax.random.PRNGKey(0), tables,
        x_center=center, s_noise=0.0,
    )
    np.testing.assert_allclose(np.asarray(out), -0.4, atol=1e-3)


def test_churn_tables():
    cfg = SamplerConfig(s_churn=10.0, restore_cfg=0.0)
    sigmas = legacy_ddpm_sigmas(5)
    tables = S.make_step_tables(sigmas, cfg)
    gamma = min(10.0 / 5, 2**0.5 - 1)
    np.testing.assert_allclose(
        tables.sigma_hat, tables.sigma * (1 + gamma), rtol=1e-6
    )
    np.testing.assert_allclose(
        tables.churn_std,
        np.sqrt(tables.sigma_hat**2 - tables.sigma**2),
        rtol=1e-5,
    )


def test_linear_cfg_and_control_tables():
    cfg = SamplerConfig(use_linear_cfg=True, cfg_scale=7.5, cfg_scale_min=4.0,
                        s_churn=0.0, restore_cfg=0.0)
    sigmas = legacy_ddpm_sigmas(10)
    tables = S.make_step_tables(
        sigmas, cfg, control_scale=1.0, use_linear_control_scale=True,
        control_scale_start=0.0,
    )
    # CFG scale at sigma_max is `scale` = 7.5, decays toward scale_min
    assert abs(tables.cfg_scale[0] - 7.5) < 1e-4
    assert tables.cfg_scale[-1] < tables.cfg_scale[0]
    # control scale ramps from ~0 (at sigma_max) to 1 (at sigma ~ 0)
    assert tables.control_scale[0] < 0.01
    assert tables.control_scale[-1] > 0.95


def test_substep_sigmas():
    sig = S.substep_sigmas(4)
    assert len(sig) == 5
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig[:-1]) < 0)


def test_dpmpp2m_sde_noise_is_seeded():
    """eta>0 path is deterministic given the rng key."""
    cfg = SamplerConfig(s_churn=0.0, restore_cfg=0.0)
    tables = S.restore_dpmpp2m_tables(cfg, 4)
    x0 = jax.random.normal(jax.random.PRNGKey(2), SHAPE) * float(tables.sigma[0])
    # leaky denoiser: output depends on x, so injected noise propagates
    den = lambda x, s, c, cs: 0.5 * x
    a = S.dpmpp2m_sample(den, x0, jax.random.PRNGKey(3), tables, eta=1.0)
    b = S.dpmpp2m_sample(den, x0, jax.random.PRNGKey(3), tables, eta=1.0)
    c = S.dpmpp2m_sample(den, x0, jax.random.PRNGKey(4), tables, eta=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # and the perfect denoiser still converges regardless of noise
    out = S.dpmpp2m_sample(
        perfect_denoise(jnp.full(SHAPE, 0.3)), x0, jax.random.PRNGKey(3), tables, eta=1.0
    )
    np.testing.assert_allclose(np.asarray(out), 0.3, atol=1e-3)
