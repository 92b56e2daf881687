"""TiledRestoreDPMPP2M path through the engine + perfect-denoiser invariant."""

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.config import SamplerConfig
from supir_tpu.diffusion import samplers as S
from supir_tpu.engine.factory import create_engine, tiny_test_config
from supir_tpu.parallel.tiled_sampler import tiled_restore_dpmpp2m_sample
import pytest


def test_tiled_dpmpp2m_perfect_denoiser():
    shape = (1, 16, 16, 4)
    cfg = SamplerConfig(s_churn=0.0, restore_cfg=0.0)
    tables = S.restore_dpmpp2m_tables(cfg, 4)
    target = 0.42

    def denoise_tile(x_tiles, sigma, cfg_b, ctrl_s, control_tiles, ca):
        return jnp.full_like(x_tiles, target)

    x0 = jax.random.normal(jax.random.PRNGKey(0), shape) * float(tables.sigma[0])
    out = tiled_restore_dpmpp2m_sample(
        denoise_tile, x0, jax.random.PRNGKey(1), tables,
        control_tiles=jnp.zeros((9, 1, 8, 8, 4)),
        tile_size=8, tile_stride=4, eta=1.0, s_noise=0.0,
    )
    np.testing.assert_allclose(np.asarray(out), target, atol=1e-3)


@pytest.mark.slow
def test_engine_tiled_dpmpp2m_pipeline():
    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (1, 128, 128, 3)) * 0.3, -1, 1)
    z = engine.encode_first_stage_with_denoise(x)
    k = jax.random.PRNGKey(3)
    tok = jax.random.randint(k, (1, 77), 0, 49408)
    c, uc = engine.prepare_condition(z, tok, tok, tok, tok)
    out = engine.batchify_sample_tiled(
        x, c, uc, num_steps=2, tile_size=8, tile_stride=4,
        sampler_name="TiledRestoreDPMPP2M", cfg_scale=2.0, seed=9,
    )
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.heavy
def test_tiled_dpmpp2m_segmentation_bit_invariant():
    """steps_per_call must not change DPM++2M outputs: the
    (old_denoised, prev_sigma) carry threads across segments and the
    Brownian-tree noise is keyed by GLOBAL sigma intervals (reference runs
    one loop with one noise stream, sampling.py:663-730). Checked with SDE
    noise ON (eta=1, s_noise>0) at the sampler level."""
    shape = (1, 16, 16, 4)
    cfg = SamplerConfig(s_churn=0.0, restore_cfg=0.0)
    tables = S.restore_dpmpp2m_tables(cfg, 6)
    control = jnp.zeros((9, 1, 8, 8, 4))
    rng = jax.random.PRNGKey(7)

    def denoise_tile(x_tiles, sigma, cfg_b, ctrl_s, control_tiles, ca):
        # shape-preserving, input-dependent stand-in network
        return 0.9 * x_tiles / (1.0 + sigma[0]) + 0.05

    x0 = jax.random.normal(jax.random.PRNGKey(0), shape) * float(tables.sigma[0])

    kwargs = dict(control_tiles=control, tile_size=8, tile_stride=4,
                  eta=1.0, s_noise=1.003)
    full = tiled_restore_dpmpp2m_sample(denoise_tile, x0, rng, tables, **kwargs)

    for seg in (2, 3):
        x_cur = x0
        carry = (jnp.zeros_like(x0), jnp.ones((), jnp.float32))
        bt_range = (jnp.float32(tables.sigma[-1]), jnp.float32(tables.sigma[0]))
        for i in range(0, 6, seg):
            seg_tables = jax.tree_util.tree_map(lambda a: a[i:i + seg], tables)
            x_cur, carry = tiled_restore_dpmpp2m_sample(
                denoise_tile, x_cur, rng, seg_tables,
                step_offset=jnp.int32(i), carry_in=carry, bt_range=bt_range,
                return_carry=True, **kwargs)
        np.testing.assert_array_equal(np.asarray(x_cur), np.asarray(full)), seg


@pytest.mark.heavy
def test_engine_dpmpp2m_steps_per_call_matches():
    """Engine-level: batchify_sample_tiled(TiledRestoreDPMPP2M) with
    steps_per_call equals the single-program run (round-2 gap: this raised
    NotImplementedError)."""
    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 0.3, -1, 1)
    z = engine.encode_first_stage_with_denoise(x)
    k = jax.random.PRNGKey(3)
    tok = jax.random.randint(k, (1, 77), 0, 49408)
    c, uc = engine.prepare_condition(z, tok, tok, tok, tok)

    common = dict(num_steps=4, tile_size=4, tile_stride=2, seed=11,
                  sampler_name="TiledRestoreDPMPP2M", z_override=z,
                  color_fix_type="None")
    full = engine.batchify_sample_tiled(x, c, uc, **common)
    seg = engine.batchify_sample_tiled(x, c, uc, steps_per_call=2, **common)
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(full))
