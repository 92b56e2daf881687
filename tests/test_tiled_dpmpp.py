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
