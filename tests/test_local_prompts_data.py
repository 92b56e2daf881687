"""Per-tile local prompts + length-grouped batch sampler + sharded
inference params."""

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.captioner.data import (
    length_grouped_indices,
    rank_batches,
    split_to_even_chunks,
)
from supir_tpu.engine.factory import create_engine, tiny_test_config
from supir_tpu.parallel.mesh import make_mesh
import pytest


def test_split_to_even_chunks_balances():
    lengths = [10, 9, 8, 1, 1, 1]
    chunks = split_to_even_chunks(list(range(6)), lengths, 2)
    loads = [sum(lengths[i] for i in c) for c in chunks]
    assert len(chunks) == 2 and all(len(c) == 3 for c in chunks)
    assert abs(loads[0] - loads[1]) <= 9


def test_length_grouped_indices_cover_all():
    lengths = [5, -3, 8, -2, 7, 6, -4, 9]  # mixed modality
    idx = length_grouped_indices(lengths, batch_size=2, world_size=2, seed=1)
    assert sorted(idx) == list(range(8))


def test_rank_batches_partition():
    lengths = list(range(1, 17))
    b0 = rank_batches(lengths, 2, 2, rank=0, seed=3)
    b1 = rank_batches(lengths, 2, 2, rank=1, seed=3)
    assert len(b0) == len(b1)
    for x, y in zip(b0, b1):
        assert len(x) == 2 and len(y) == 2
        assert not (set(x) & set(y))


@pytest.mark.slow
def test_prepare_condition_tiled_and_sample():
    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (1, 128, 128, 3)) * 0.3, -1, 1)
    z = engine.encode_first_stage_with_denoise(x)  # [1,16,16,4]
    # 16x16 latent, tile 8 stride 4 -> 9 tiles
    t = 9
    k = jax.random.PRNGKey(3)
    toks = jax.random.randint(k, (t, 77), 0, 49408)
    tok_uc = jax.random.randint(jax.random.fold_in(k, 1), (1, 77), 0, 49408)
    c, uc = engine.prepare_condition_tiled(z, toks, toks, tok_uc, tok_uc)
    assert c["crossattn_tiles"].shape == (t, 1, 77, cfg.unet.context_dim)
    out = engine.batchify_sample_tiled(
        x, c, uc, num_steps=2, tile_size=8, tile_stride=4, seed=5
    )
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_tiled_vae_cache_tracks_mesh():
    """Regression: setting a mesh *after* the first tiled encode must change
    the cached tiled-VAE executable (the round-1 bug silently kept using the
    mesh-less spec forever)."""
    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    engine.init_tile_vae(encoder_tile_size=64, decoder_tile_size=8)
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (1, 128, 128, 3)) * 0.3, -1, 1)
    z0 = engine.encode_first_stage_with_denoise(x)  # populates mesh-less cache
    f_nomesh, _, _, _ = engine._tiled_vae_fns(*engine._tile_vae, mesh_key=engine._mesh_key())
    mesh = make_mesh((1, 4, 2), ("data", "tile", "model"))
    engine.set_tiled_mesh(mesh)
    f_mesh, _, _, _ = engine._tiled_vae_fns(*engine._tile_vae, mesh_key=engine._mesh_key())
    assert f_mesh is not f_nomesh
    z1 = engine.encode_first_stage_with_denoise(x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-4)


@pytest.mark.slow
def test_shard_for_inference_places_params():
    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    mesh = make_mesh((2, 4), ("data", "model"))
    engine.shard_for_inference(mesh)
    kern = engine.params["unet"]["enc"]["mid_attn"]["block_0"]["attn1"]["to_q"][
        "Dense_0"
    ]["kernel"]
    assert len(kern.sharding.device_set) >= 1
    # engine still runs after sharding
    x = jnp.zeros((1, 64, 64, 3))
    out = engine.batchify_denoise(x)
    assert np.isfinite(np.asarray(out)).all()
