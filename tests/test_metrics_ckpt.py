"""Metrics + orbax checkpoint roundtrip + profiling utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.utils.checkpoint import load_params, save_params
from supir_tpu.utils.metrics import LPIPS, psnr, ssim
from supir_tpu.utils.profiling import Phase, sync


def test_psnr_identity_and_known_value():
    a = jnp.zeros((1, 16, 16, 3))
    b = jnp.full((1, 16, 16, 3), 0.2)
    assert float(psnr(a, a)[0]) > 100
    # mse = 0.04, range 2 -> 10*log10(4/0.04) = 20dB
    np.testing.assert_allclose(float(psnr(a, b)[0]), 20.0, atol=1e-3)


def test_ssim_identity_and_degradation(rng):
    a = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    assert float(ssim(a, a)[0]) > 0.999
    noisy = a + 0.5 * jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    assert float(ssim(a, noisy)[0]) < 0.9


def test_lpips_structure(rng):
    m = LPIPS()
    a = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), a, b)["params"]
    d_same = m.apply({"params": params}, a, a)
    d_diff = m.apply({"params": params}, a, b)
    assert float(d_same[0]) < 1e-6
    assert float(d_diff[0]) > float(d_same[0])


def test_orbax_roundtrip(tmp_path):
    params = {"layer": {"kernel": jnp.arange(12.0).reshape(3, 4), "bias": jnp.ones(4)}}
    path = os.path.join(tmp_path, "ckpt")
    save_params(path, params)
    loaded = load_params(path)
    np.testing.assert_array_equal(
        np.asarray(loaded["layer"]["kernel"]), np.asarray(params["layer"]["kernel"])
    )


def test_phase_timers():
    ph = Phase()
    x = jnp.ones((8, 8))
    with ph.measure("mm", [x]):
        x = x @ x
    assert "mm" in ph.times and ph.counts["mm"] == 1
    assert "mm=" in ph.report()
    sync(x)
