"""Schedule/scaling/guidance numerics (SURVEY.md section 7 phase 1).

Golden checks use closed-form values and the well-known SDXL constants
(sigma_max of the LegacyDDPM table = 14.6146, reference sampling.py:541).
"""

import numpy as np
import jax.numpy as jnp

from supir_tpu.diffusion import (
    SIGMA_MAX_LEGACY,
    DiscreteDenoiser,
    cfg_combine,
    edm_sigmas,
    eps_scaling,
    karras_sigmas,
    legacy_ddpm_sigma_table,
    legacy_ddpm_sigmas,
    linear_cfg_scale,
    roughly_equally_spaced_steps,
)


def test_legacy_table_endpoints():
    table = legacy_ddpm_sigma_table()
    assert table.shape == (1000,)
    assert np.all(np.diff(table) > 0)  # ascending in t
    # the famous constant used throughout the reference schedules
    assert abs(table[-1] - SIGMA_MAX_LEGACY) < 5e-4
    # sigma_0 = sqrt(beta_0/(1-beta_0)) = sqrt(0.00085/0.99915)
    assert abs(table[0] - np.sqrt(0.00085 / (1 - 0.00085))) < 1e-6


def test_legacy_subsampled_schedule():
    sig = legacy_ddpm_sigmas(50)
    assert sig.shape == (51,)
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig[:-1]) < 0)  # descending
    # first sigma is the table max (step indices include 999)
    assert abs(sig[0] - legacy_ddpm_sigma_table()[-1]) < 1e-6


def test_roughly_equally_spaced_steps():
    idx = roughly_equally_spaced_steps(50, 1000)
    assert idx.shape == (50,)
    assert idx[-1] == 999
    assert np.all(np.diff(idx) > 0)
    # n == max: identity-ish coverage
    idx1000 = roughly_equally_spaced_steps(1000, 1000)
    assert idx1000[0] == 0 and idx1000[-1] == 999


def test_edm_and_karras_sigmas():
    sig = edm_sigmas(10)
    assert sig.shape == (11,)
    assert abs(sig[0] - 80.0) < 1e-4 and abs(sig[9] - 0.02) < 1e-6
    assert sig[10] == 0.0
    k = karras_sigmas(8, 0.03, 14.6146)
    assert k.shape == (9,)
    assert abs(k[0] - 14.6146) < 1e-3 and abs(k[7] - 0.03) < 1e-5 and k[8] == 0


def test_eps_scaling_closed_form():
    sigma = jnp.array([0.5, 1.0, 14.6146])
    c_skip, c_out, c_in, c_noise = eps_scaling(sigma)
    np.testing.assert_allclose(c_skip, 1.0)
    np.testing.assert_allclose(c_out, -sigma)
    np.testing.assert_allclose(c_in, 1.0 / np.sqrt(sigma**2 + 1.0), rtol=1e-6)
    np.testing.assert_allclose(c_noise, sigma)


def test_linear_cfg_schedule():
    # at sigma_max the scale is `scale`; at 0 it is `scale_min`
    assert abs(linear_cfg_scale(np.float32(SIGMA_MAX_LEGACY), 7.5, 4.0) - 7.5) < 1e-5
    assert abs(linear_cfg_scale(np.float32(0.0), 7.5, 4.0) - 4.0) < 1e-6
    mid = linear_cfg_scale(np.float32(SIGMA_MAX_LEGACY / 2), 7.5, 4.0)
    assert abs(mid - (4.0 + 3.5 / 2)) < 1e-5


def test_cfg_combine():
    uc = jnp.zeros((2, 4, 4, 4))
    c = jnp.ones((2, 4, 4, 4))
    out = cfg_combine(uc, c, jnp.array([2.0, 3.0]))
    assert out[0, 0, 0, 0] == 2.0 and out[1, 0, 0, 0] == 3.0


def test_discrete_denoiser_quantization():
    d = DiscreteDenoiser()
    table = d.sigma_table
    # exact table entries map to their own index
    idx = d.sigma_to_idx(jnp.asarray(table[[0, 17, 500, 999]]))
    np.testing.assert_array_equal(np.asarray(idx), [0, 17, 500, 999])
    # slightly perturbed sigma snaps back
    idx2 = d.sigma_to_idx(jnp.asarray(table[[500]]) * 1.0001)
    assert int(idx2[0]) == 500


def test_discrete_denoiser_eps_identity():
    """With a zero network, EpsScaling gives D(x) = x (c_skip = 1)."""
    d = DiscreteDenoiser()
    x = jnp.ones((1, 8, 8, 4))
    sigma = jnp.array([1.0])
    got_t = {}

    def net(xin, t, cond, cs):
        got_t["t"] = t
        return jnp.zeros_like(xin)

    out = d(net, x, sigma, cond=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)
    # timestep fed to the network is the quantized table index
    assert got_t["t"].dtype == jnp.float32
    tbl_idx = int(np.argmin(np.abs(d.sigma_table - 1.0)))
    assert int(got_t["t"][0]) == tbl_idx


def test_discrete_denoiser_eps_formula():
    """D(x) = net(x*c_in)*(-sigma) + x for eps scaling."""
    d = DiscreteDenoiser()
    x = jnp.full((1, 4, 4, 4), 2.0)
    sigma_val = float(d.sigma_table[700])
    sigma = jnp.array([sigma_val])

    def net(xin, t, cond, cs):
        return xin  # identity network

    out = d(net, x, sigma, cond=None)
    c_in = 1.0 / np.sqrt(sigma_val**2 + 1.0)
    expected = 2.0 * c_in * (-sigma_val) + 2.0
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)
