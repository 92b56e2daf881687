"""Sampler torch-golden parity: drive the reference's OWN RestoreEDMSampler
and RestoreDPMPP2MSampler (`sgm/modules/diffusionmodules/sampling.py:
422-597`) with a shared analytic denoiser and assert our lax.scan samplers
reproduce the full trajectories — CFG prepare/combine, LinearCFG schedule,
restoration guidance, churn noise injection, Euler / DPM++(2M) update math,
and the prepare_sampling_loop x-scaling, end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from supir_tpu.config import SamplerConfig
from supir_tpu.diffusion import samplers as S
from supir_tpu.diffusion.discretization import legacy_ddpm_sigmas
from tests import ref_oracle as O

torch = pytest.importorskip("torch")

SHAPE = (1, 4, 8, 8)


def _toy_torch(x, sigma, flag, ctrl):
    """Analytic 'network' D(x, sigma): smooth, nonlinear in every input.
    flag is 1.0 for cond rows, 0.0 for uncond rows."""
    s = sigma.view(-1, 1, 1, 1)
    return torch.tanh(0.8 * x) - 0.05 * x + 0.1 * s * flag + 0.02 * ctrl * x


def _toy_jax(x, sigma, flag, ctrl):
    s = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.tanh(0.8 * x) - 0.05 * x + 0.1 * s * flag + 0.02 * ctrl * x


def _torch_denoiser(c_flag=1.0, u_flag=0.0):
    """denoiser(x2, s2, cond, control_scale) as the guider emits it:
    rows [uncond; cond] (guiders.py:31-41 cat order)."""

    def den(x2, s2, c, control_scale):
        b = x2.shape[0] // 2
        flag = torch.cat([
            torch.full((b, 1, 1, 1), u_flag), torch.full((b, 1, 1, 1), c_flag)
        ])
        return _toy_torch(x2, s2, flag, control_scale)

    return den


def _jax_denoise(c_flag=1.0, u_flag=0.0):
    """Our engine-style closure: CFG folded inside (engine/supir.py)."""

    def den(x, sigma_b, cfg_b, ctrl_s):
        d_u = _toy_jax(x, sigma_b, u_flag, ctrl_s)
        d_c = _toy_jax(x, sigma_b, c_flag, ctrl_s)
        from supir_tpu.diffusion.guidance import cfg_combine

        return cfg_combine(d_u, d_c, cfg_b)

    return den


def _cond():
    one = torch.ones(1, 1, 1, 1)
    return (
        {"vector": one, "crossattn": one, "control": one},
        {"vector": 0 * one, "crossattn": 0 * one, "control": 0 * one},
    )


def _ref_sampler(cls_name, num_steps, **kw):
    ref = O.load_ref()
    cls = getattr(ref["sampling"], cls_name)
    return cls(
        num_steps=num_steps,
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"
        },
        guider_config={
            "target": "sgm.modules.diffusionmodules.guiders.LinearCFG",
            "params": {"scale": 7.5, "scale_min": 4.0},
        },
        device="cpu",
        verbose=False,
        **kw,
    )


def test_restore_edm_full_run_matches_reference():
    """8 deterministic steps (s_churn=0): CFG + restore guidance + linear
    control scale + Euler, the reference default Q-path (sampling.py:528-597)."""
    n = 8
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    xc = rng.standard_normal(SHAPE).astype(np.float32)

    sampler_t = _ref_sampler(
        "RestoreEDMSampler", n, s_churn=0.0, s_noise=1.003,
        restore_cfg=4.0, restore_cfg_s_tmin=0.05,
    )
    c, uc = _cond()
    with torch.no_grad():
        want = sampler_t(
            _torch_denoiser(), torch.from_numpy(x0.copy()), c, uc=uc,
            x_center=torch.from_numpy(xc), control_scale=0.9,
            use_linear_control_scale=True, control_scale_start=0.0,
        )

    cfg = SamplerConfig(
        num_steps=n, s_churn=0.0, s_noise=1.003, restore_cfg=4.0,
        restore_cfg_s_tmin=0.05, cfg_scale=7.5, cfg_scale_min=4.0,
        use_linear_cfg=True,
    )
    sigmas = legacy_ddpm_sigmas(n)
    tables = S.make_step_tables(
        sigmas, cfg, control_scale=0.9, use_linear_control_scale=True,
        control_scale_start=0.0,
    )
    x_j = S.prepare_x(jnp.asarray(O.nhwc(x0)), sigmas)
    got = S.restore_edm_sample(
        _jax_denoise(), x_j, jax.random.PRNGKey(0), tables,
        x_center=jnp.asarray(O.nhwc(xc)), s_noise=1.003,
    )
    np.testing.assert_allclose(O.nchw(got), O._np(want), atol=2e-5, rtol=1e-4)


def test_restore_edm_churn_step_matches_reference():
    """One churn step (gamma>0) with the SAME eps injected both sides
    (sampler_step eps_noise arg, sampling.py:551-566)."""
    n = 8
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    xc = rng.standard_normal(SHAPE).astype(np.float32)

    cfg = SamplerConfig(
        num_steps=n, s_churn=5.0, s_noise=1.003, restore_cfg=4.0,
        restore_cfg_s_tmin=0.05, cfg_scale=7.5, cfg_scale_min=4.0,
        use_linear_cfg=True,
    )
    sigmas = legacy_ddpm_sigmas(n)
    tables = S.make_step_tables(sigmas, cfg, control_scale=1.0)
    step_i = 2

    # our single step: 1-step tables sliced at step_i, fixed key
    one = S.StepTables(**{
        f.name: getattr(tables, f.name)[step_i:step_i + 1]
        for f in __import__("dataclasses").fields(S.StepTables)
    })
    key = jax.random.PRNGKey(3)
    got = S.restore_edm_sample(
        _jax_denoise(), jnp.asarray(O.nhwc(x0)), key, one,
        x_center=jnp.asarray(O.nhwc(xc)), s_noise=1.003,
    )

    # the eps our scan drew (restore_edm_sample folds: split(rng, n)[0])
    eps = jax.random.normal(jax.random.split(key, 1)[0],
                            O.nhwc(x0).shape, jnp.float32)

    sampler_t = _ref_sampler(
        "RestoreEDMSampler", n, s_churn=5.0, s_noise=1.003,
        restore_cfg=4.0, restore_cfg_s_tmin=0.05,
    )
    c, uc = _cond()
    num_sigmas = n + 1
    gamma = min(5.0 / (num_sigmas - 1), 2 ** 0.5 - 1)
    with torch.no_grad():
        want = sampler_t.sampler_step(
            torch.tensor([float(tables.sigma[step_i])]),
            torch.tensor([float(tables.next_sigma[step_i])]),
            _torch_denoiser(), torch.from_numpy(x0.copy()), c, uc,
            gamma=gamma, x_center=torch.from_numpy(xc),
            eps_noise=torch.from_numpy(O.nchw(eps)),
            control_scale=1.0,
        )
    np.testing.assert_allclose(O.nchw(got), O._np(want), atol=2e-5, rtol=1e-4)


def _run_dpmpp2m_pair(monkeypatch, noise_cls, our_noise_fn, n=10):
    """Run reference RestoreDPMPP2MSampler and our dpmpp2m_sample on the
    same toy denoiser; `noise_cls` replaces the torch Brownian sampler
    (patched on the sampling MODULE: the `from k_diffusion.sampling
    import ...` binding, not the source module), `our_noise_fn` replaces
    our brownian_increment."""
    ref = O.load_ref()
    rng = np.random.default_rng(2)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)

    cfg = SamplerConfig(
        num_steps=n, cfg_scale=7.5, cfg_scale_min=4.0, use_linear_cfg=True,
        eta=1.0,
    )
    tables = S.restore_dpmpp2m_tables(cfg, n, control_scale=0.8)

    monkeypatch.setattr(ref["sampling"], "BrownianTreeNoiseSampler", noise_cls)
    if our_noise_fn is not None:
        monkeypatch.setattr(S, "brownian_increment", our_noise_fn)
    sampler_t = _ref_sampler(
        "RestoreDPMPP2MSampler", n, s_churn=0.0, s_noise=1.0, eta=1.0,
        restore_cfg=4.0, restore_cfg_s_tmin=0.05,
    )
    c, uc = _cond()
    with torch.no_grad():
        want = sampler_t(
            _torch_denoiser(), torch.from_numpy(x0.copy()), c, uc=uc,
            control_scale=0.8,
        )

    # prepare_sampling_loop scales x by the *LegacyDDPM* sigma_0 before the
    # Karras re-ramp replaces the schedule (sampling.py:486-492)
    x_j = S.prepare_x(jnp.asarray(O.nhwc(x0)), legacy_ddpm_sigmas(n))
    got = S.dpmpp2m_sample(
        _jax_denoise(), x_j, jax.random.PRNGKey(0), tables, eta=1.0,
        brownian=True,
    )
    return O.nchw(got), O._np(want), tables


def test_restore_dpmpp2m_deterministic_math_matches_reference(monkeypatch):
    """10 DPM++(2M) steps at the reference's Lightning default eta=1 with
    the SDE noise zeroed on BOTH sides: Karras re-ramp between the
    LegacyDDPM extremes + the eta-weighted multistep update math
    (sampling.py:422-525), compared deterministically.

    eta=0 is untestable against the oracle: the reference itself NaNs at
    the terminal step (eta*h = 0*inf in get_mult, sampling.py:435-439)."""

    class ZeroNoise:
        def __init__(self, *a, **kw):
            pass

        def __call__(self, sigma, sigma_next):
            return torch.zeros((1,) + SHAPE[1:])

    def zeros(key, sf, st, smin, smax, shape, dtype=jnp.float32, levels=24):
        return jnp.zeros(shape, dtype)

    got, want, _ = _run_dpmpp2m_pair(monkeypatch, ZeroNoise, zeros)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_restore_dpmpp2m_sde_run_matches_reference(monkeypatch):
    """Same 10 steps with live SDE noise: the torch side consumes OUR
    virtual-Brownian-tree increments (same master key), so the noise
    *weights* (next_sigma * sqrt(-expm1(-2*eta*h)) * s_noise,
    sampling.py:480-482) and injection gating are compared; the noise
    source itself is an accepted redesign (README). fp32 trajectory drift
    across 10 steps at |x|~14 bounds the tolerance."""
    key = jax.random.PRNGKey(0)
    # span must match restore_dpmpp2m_tables' karras ramp extremes
    cfg = SamplerConfig(num_steps=10)
    tb = S.restore_dpmpp2m_tables(cfg, 10)
    bt_min, bt_max = float(tb.sigma[-1]), float(tb.sigma[0])

    class OurNoise:
        def __init__(self, *a, **kw):
            pass

        def __call__(self, sigma, sigma_next):
            inc = S.brownian_increment(
                key, float(sigma.flatten()[0]),
                float(sigma_next.flatten()[0]), bt_min, bt_max,
                (1,) + SHAPE[2:] + (SHAPE[1],),
            )
            return torch.from_numpy(O.nchw(inc))

    got, want, _ = _run_dpmpp2m_pair(monkeypatch, OurNoise, None)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
