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


def test_substep_sampler_path(engine):
    """'Substep' (reference SubstepSampler, sampling.py:371-420): Euler-
    ancestral over the fixed 1000-step subset [0,100,200,300,1000]. The
    engine must accept the name and the subset schedule must actually take
    effect (output differs from EulerAncestral on the default schedule)."""
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(5), (1, 64, 64, 3)) * 0.3, -1, 1)
    z = engine.encode_first_stage_with_denoise(x)
    k = jax.random.PRNGKey(6)
    c, uc = engine.prepare_condition(z, _tokens(k), _tokens(k), _tokens(k), _tokens(k))
    kw = dict(num_steps=4, cfg_scale=2.0, seed=7, z_override=z,
              color_fix_type="None")
    sub = engine.batchify_sample(x, c, uc, sampler_name="Substep", **kw)
    assert sub.shape == x.shape
    assert np.isfinite(np.asarray(sub)).all()
    ea = engine.batchify_sample(x, c, uc, sampler_name="EulerAncestral", **kw)
    assert np.abs(np.asarray(sub) - np.asarray(ea)).max() > 1e-4, (
        "Substep ran the default schedule — the subset sigmas were ignored"
    )


@pytest.mark.heavy
def test_feature_cache_interval_one_is_bit_identical(engine):
    """The cached-sampler wiring with recompute-every-step must reproduce
    the plain path EXACTLY (same churn noise stream, same network calls) —
    pins that the cache plumbing itself changes nothing."""
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(5), (1, 64, 64, 3)) * 0.3, -1, 1)
    z = engine.encode_first_stage_with_denoise(x)
    k = jax.random.PRNGKey(6)
    c, uc = engine.prepare_condition(
        z, _tokens(k), _tokens(k), _tokens(jax.random.fold_in(k, 1)),
        _tokens(jax.random.fold_in(k, 1)),
    )
    kw = dict(num_steps=3, restoration_scale=4.0, cfg_scale=4.0,
              s_churn=5.0, color_fix_type="None", seed=11, z_override=z)
    base = engine.batchify_sample(x, c, uc, **kw)
    cached = engine.batchify_sample(x, c, uc, feature_cache_interval=1, **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cached))


@pytest.mark.heavy
def test_feature_cache_interval_two_runs_and_approximates(engine):
    """interval=2 reuses encoder/control features on odd steps: output must
    stay finite, and differ from the exact path (it is an approximation,
    not a no-op). The stock tiny engine's zero-init output head makes
    eps==0 regardless of features, so perturb the params to give the
    network a real x-dependence before comparing."""
    from supir_tpu.engine.supir import SUPIREngine

    leaves, treedef = jax.tree_util.tree_flatten(engine.params)
    ks = jax.random.split(jax.random.PRNGKey(99), len(leaves))
    leaves = [
        a + 0.02 * jax.random.normal(kk, a.shape, a.dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a
        for a, kk in zip(leaves, ks)
    ]
    eng2 = SUPIREngine(
        engine.cfg, jax.tree_util.tree_unflatten(treedef, leaves),
        cond_cfg=engine.cond_cfg,
    )
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(7), (1, 64, 64, 3)) * 0.3, -1, 1)
    z = eng2.encode_first_stage_with_denoise(x)
    k = jax.random.PRNGKey(8)
    c, uc = eng2.prepare_condition(
        z, _tokens(k), _tokens(k), _tokens(jax.random.fold_in(k, 1)),
        _tokens(jax.random.fold_in(k, 1)),
    )
    kw = dict(num_steps=4, restoration_scale=4.0, cfg_scale=4.0,
              color_fix_type="None", seed=12, z_override=z)
    base = eng2.batchify_sample(x, c, uc, **kw)
    fast = eng2.batchify_sample(x, c, uc, feature_cache_interval=2, **kw)
    a, b = np.asarray(base), np.asarray(fast)
    assert np.isfinite(b).all()
    assert b.shape == a.shape
    assert not np.array_equal(a, b)
    # the approximation must stay in the same ballpark as the exact output
    assert np.abs(a - b).mean() < 0.5 * (np.abs(a).mean() + 1e-6) + 0.5


def test_feature_cache_rejected_for_other_samplers(engine):
    x = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError):
        engine.batchify_sample(
            x, {}, {}, num_steps=2, sampler_name="EulerEDM",
            feature_cache_interval=2,
        )


# ------------------------------------------------- round-4 ADVICE fixes


def test_override_shape_validation(engine):
    """Wrong-shaped noise overrides fail with a clear ValueError up front,
    not an opaque broadcast error inside jit."""
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 0.3, -1, 1)
    z = engine.encode_first_stage_with_denoise(x)
    k = jax.random.PRNGKey(3)
    c, uc = engine.prepare_condition(z, _tokens(k), _tokens(k), _tokens(k), _tokens(k))
    bad = np.zeros((1, 4, 4, 4), np.float32)
    with pytest.raises(ValueError, match="noise_override"):
        engine.batchify_sample(x, c, uc, num_steps=2, z_override=z,
                               noise_override=bad)
    with pytest.raises(ValueError, match="center_noise_override"):
        engine.batchify_sample(x, c, uc, num_steps=2, z_override=z,
                               center_noise_override=bad)


def test_tiled_encode_sampled_posterior(engine):
    """Under tiled VAE the sampled-posterior encode is supported (the
    reference samples even in tiled mode: VAEHook wraps only
    encoder.forward, posterior.sample() still runs) and follows the
    mean + std * noise contract with a noise-independent positive std."""
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3)) * 0.3, -1, 1)
    engine.init_tile_vae(encoder_tile_size=32, decoder_tile_size=8, chunk=None)
    try:
        mode = np.asarray(engine.encode_first_stage(x))
        n1 = jax.random.normal(jax.random.PRNGKey(5), mode.shape)
        n2 = jax.random.normal(jax.random.PRNGKey(6), mode.shape)
        s1 = np.asarray(engine.encode_first_stage(x, noise=n1))
        s2 = np.asarray(engine.encode_first_stage(x, noise=n2))
    finally:
        engine._tile_vae = None
    assert not np.array_equal(s1, mode)
    # implied std = (sample - mean)/noise must be positive and identical
    # for two different noises (i.e. the sample really is mean + std*noise)
    r1 = (s1 - mode) / np.asarray(n1)
    r2 = (s2 - mode) / np.asarray(n2)
    assert (r1 > 0).all()
    np.testing.assert_allclose(r1, r2, rtol=2e-3, atol=1e-5)


@pytest.mark.slow
def test_tiled_sample_accepts_noise_overrides(engine):
    """batchify_sample_tiled mirrors the noise_override/center_noise_override
    hooks so the tiled engine path is coverable by the same parity harness
    as batchify_sample; explicit overrides make the run reproducible."""
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 0.3, -1, 1)
    z = engine.encode_first_stage_with_denoise(x)
    k = jax.random.PRNGKey(3)
    c, uc = engine.prepare_condition(z, _tokens(k), _tokens(k), _tokens(k), _tokens(k))
    nz = jax.random.normal(jax.random.PRNGKey(11), z.shape)
    cn = jax.random.normal(jax.random.PRNGKey(12), z.shape)
    kw = dict(num_steps=2, tile_size=4, tile_stride=4, z_override=z, seed=0)
    a = engine.batchify_sample_tiled(x, c, uc, noise_override=nz,
                                     center_noise_override=cn, **kw)
    b = engine.batchify_sample_tiled(x, c, uc, noise_override=nz,
                                     center_noise_override=cn, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="noise_override"):
        engine.batchify_sample_tiled(
            x, c, uc, noise_override=np.zeros((1, 2, 2, 4), np.float32), **kw)
