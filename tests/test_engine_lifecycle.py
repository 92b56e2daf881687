"""Engine instances must be garbage-collectable after use.

The reference frees a GPU by dropping the model and calling
torch.cuda.empty_cache(); our equivalent contract is that dropping the
last reference to a SUPIREngine (web-demo Q/F hot-swap, bench --e2e
engine->captioner chip swap) releases the instance — including the
per-instance jit-closure caches on `_sample_fn` / `_tiled_vae_fns` /
`_tiled_sample_fn`. A class-level `functools.lru_cache` on those methods
would key on `self` and pin every engine (and its params) for the life of
the process; this test pins the fixed behavior.
"""

import gc
import weakref

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supir_tpu.engine.factory import create_engine, tiny_test_config


def _make_used_engine():
    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    tok = np.zeros((1, 77), np.int32)
    z = engine.encode_first_stage_with_denoise(x)
    c, uc = engine.prepare_condition(z, tok, tok, tok, tok)
    # exercise the per-instance cached sample path (the leak site)
    out = engine.batchify_sample(
        x, c, uc, num_steps=2, restoration_scale=0.0, cfg_scale=2.0, seed=0
    )
    assert out.shape == (1, 64, 64, 3)
    return engine


def test_engine_collectable_after_sampling():
    engine = _make_used_engine()
    # the method memo must live on the instance, not the class
    assert any(k.startswith("__memo_") for k in engine.__dict__), (
        "expected per-instance method caches on the engine"
    )
    ref = weakref.ref(engine)
    del engine
    gc.collect()
    assert ref() is None, (
        "SUPIREngine leaked after del — a class-level cache still holds it"
    )


def test_two_engines_do_not_accumulate():
    # Q/F hot-swap pattern: building a replacement engine must not grow a
    # process-wide cache of dead engines.
    refs = []
    for _ in range(2):
        e = _make_used_engine()
        refs.append(weakref.ref(e))
        del e
        gc.collect()
    assert all(r() is None for r in refs)
