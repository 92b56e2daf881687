"""Feature cache on the TILED path (round-4): tile-indexed cross-step
encoder/control caching under batchify_sample_tiled.

Contracts pinned here:
  - interval=1 (recompute every step) is BIT-IDENTICAL to the plain tiled
    path — folded, chunked, and local-prompt variants;
  - interval=2 runs, stays finite, genuinely differs (it approximates);
  - steps_per_call segmentation with the cache threaded across segments is
    BIT-IDENTICAL to the unsegmented cached run (global-step recompute
    flags + carried cache);
  - rejected for the DPM++ tiled sampler.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supir_tpu.engine.factory import create_engine, tiny_test_config

pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module")
def engine():
    cfg, cond_cfg = tiny_test_config()
    eng = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    # perturb params: the stock tiny engine's zero-init output head makes
    # eps==0 regardless of features (same trick as the flat cache test)
    leaves, treedef = jax.tree_util.tree_flatten(eng.params)
    ks = jax.random.split(jax.random.PRNGKey(99), len(leaves))
    leaves = [
        a + 0.02 * jax.random.normal(kk, a.shape, a.dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a
        for a, kk in zip(leaves, ks)
    ]
    from supir_tpu.engine.supir import SUPIREngine

    return SUPIREngine(
        eng.cfg, jax.tree_util.tree_unflatten(treedef, leaves),
        cond_cfg=eng.cond_cfg,
    )


@pytest.fixture(scope="module")
def inputs(engine):
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 0.3, -1, 1)
    z = engine.encode_first_stage_with_denoise(x)
    k = jax.random.PRNGKey(3)
    tok = jax.random.randint(k, (1, 77), 0, 49408)
    c, uc = engine.prepare_condition(z, tok, tok, tok, tok)
    return x, z, c, uc


KW = dict(num_steps=4, tile_size=4, tile_stride=4, seed=11, s_churn=5.0,
          color_fix_type="None")


def test_interval_one_bit_identical_folded(engine, inputs):
    x, z, c, uc = inputs
    base = engine.batchify_sample_tiled(x, c, uc, z_override=z, **KW)
    cached = engine.batchify_sample_tiled(
        x, c, uc, z_override=z, feature_cache_interval=1, **KW)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cached))


def test_interval_one_exact_chunked(engine, inputs):
    """Chunked (lax.map) cached path vs plain chunked: the lax.cond inside
    the map body changes XLA fusion groupings, so equality is to float
    tolerance (measured 5e-6 max), not bitwise like the folded path."""
    x, z, c, uc = inputs
    base = engine.batchify_sample_tiled(x, c, uc, z_override=z, tile_chunk=3, **KW)
    cached = engine.batchify_sample_tiled(
        x, c, uc, z_override=z, tile_chunk=3, feature_cache_interval=1, **KW)
    np.testing.assert_allclose(np.asarray(base), np.asarray(cached), atol=2e-5)
    # chunked must also agree with folded (chunking is pure plumbing)
    folded = engine.batchify_sample_tiled(
        x, c, uc, z_override=z, feature_cache_interval=1, **KW)
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(folded), atol=2e-5)


def test_interval_two_approximates(engine, inputs):
    x, z, c, uc = inputs
    base = np.asarray(
        engine.batchify_sample_tiled(x, c, uc, z_override=z, **KW))
    fast = np.asarray(engine.batchify_sample_tiled(
        x, c, uc, z_override=z, feature_cache_interval=2, **KW))
    assert np.isfinite(fast).all()
    assert not np.array_equal(base, fast)
    assert np.abs(base - fast).mean() < 0.5 * (np.abs(base).mean() + 1e-6) + 0.5


def test_cache_threads_across_segments(engine, inputs):
    """steps_per_call + cache: identical output to the unsegmented cached
    run (cache carried, recompute flags on GLOBAL step indices)."""
    x, z, c, uc = inputs
    whole = engine.batchify_sample_tiled(
        x, c, uc, z_override=z, feature_cache_interval=2, **KW)
    seg = engine.batchify_sample_tiled(
        x, c, uc, z_override=z, feature_cache_interval=2,
        steps_per_call=2, **KW)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(seg))
    # segment length NOT aligned with the interval (3 vs 2): reuse steps
    # straddle the segment boundary, so this only passes if the cache
    # really carries over
    seg3 = engine.batchify_sample_tiled(
        x, c, uc, z_override=z, feature_cache_interval=2,
        steps_per_call=3, **KW)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(seg3))


def test_rejected_for_tiled_dpmpp(engine, inputs):
    x, z, c, uc = inputs
    with pytest.raises(ValueError, match="TiledRestoreEDM"):
        engine.batchify_sample_tiled(
            x, c, uc, z_override=z, sampler_name="TiledRestoreDPMPP2M",
            feature_cache_interval=2, **KW)
