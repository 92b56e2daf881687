"""End-to-end pipeline test (tiny widths, random weights, CPU).

This is BASELINE.json config 1 in miniature: one small image, a few EDM
steps, no captioner — the full stage-1 -> conditioning -> sampling ->
decode -> color-fix path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supir_tpu.engine.factory import create_engine, tiny_test_config


@pytest.fixture(scope="module")
def engine():
    cfg, cond_cfg = tiny_test_config()
    return create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)


def _tokens(key, n=1):
    return jax.random.randint(key, (n, 77), 0, 49408)


def test_stage1_denoise_shapes(engine):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 0.1
    out = engine.batchify_denoise(x)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_full_sample_pipeline(engine):
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 0.3, -1, 1)
    z = engine.encode_first_stage_with_denoise(x)
    assert z.shape == (1, 8, 8, 4)

    k = jax.random.PRNGKey(3)
    c, uc = engine.prepare_condition(
        z, _tokens(k), _tokens(k), _tokens(jax.random.fold_in(k, 1)),
        _tokens(jax.random.fold_in(k, 1)),
    )
    assert c["crossattn"].shape == (1, 77, engine.cfg.unet.context_dim)
    assert c["vector"].shape == (1, engine.cfg.unet.adm_in_channels)

    samples = engine.batchify_sample(
        x, c, uc,
        num_steps=3,
        restoration_scale=4.0,
        cfg_scale=4.0,
        use_linear_cfg=True,
        cfg_scale_start=7.5,
        color_fix_type="Wavelet",
        seed=42,
    )
    assert samples.shape == x.shape
    assert np.isfinite(np.asarray(samples)).all()


def test_sample_deterministic_given_seed(engine):
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 0.3, -1, 1)
    z = engine.encode_first_stage_with_denoise(x)
    k = jax.random.PRNGKey(3)
    c, uc = engine.prepare_condition(z, _tokens(k), _tokens(k), _tokens(k), _tokens(k))
    a = engine.batchify_sample(x, c, uc, num_steps=2, seed=7)
    b = engine.batchify_sample(x, c, uc, num_steps=2, seed=7)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_log_images(engine):
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(8), (1, 64, 64, 3)) * 0.3, -1, 1)
    z = engine.encode_first_stage_with_denoise(x)
    k = jax.random.PRNGKey(9)
    c, uc = engine.prepare_condition(z, _tokens(k), _tokens(k), _tokens(k), _tokens(k))
    logs = engine.log_images(x, c, uc, num_steps=2)
    assert set(logs) == {"inputs", "stage1", "samples"}
    for v in logs.values():
        assert v.shape == x.shape
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
def test_lightning_sampler_path(engine):
    """RestoreDPMPP2M (Lightning ckpt family) on the same engine."""
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(5), (1, 64, 64, 3)) * 0.3, -1, 1)
    z = engine.encode_first_stage_with_denoise(x)
    k = jax.random.PRNGKey(6)
    c, uc = engine.prepare_condition(z, _tokens(k), _tokens(k), _tokens(k), _tokens(k))
    samples = engine.batchify_sample(
        x, c, uc, num_steps=4, sampler_name="RestoreDPMPP2M", cfg_scale=2.0,
    )
    assert samples.shape == x.shape
    assert np.isfinite(np.asarray(samples)).all()
