"""MPT decoder variant: ALiBi slopes, causal masking, forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.captioner.mpt import MPTConfig, MPTForCausalLM, build_alibi_bias
from supir_tpu.engine.factory import create_engine, tiny_test_config
import pytest


def test_alibi_slopes_power_of_two():
    bias = build_alibi_bias(4, 8, bias_max=8.0)
    assert bias.shape == (1, 4, 1, 8)
    # last position (distance 0) has zero bias for every head
    np.testing.assert_allclose(bias[0, :, 0, -1], 0.0)
    # slopes: 1/2^(i*8/4) = 1/4, 1/16, 1/64, 1/256 scaled by distance -7
    np.testing.assert_allclose(bias[0, 0, 0, 0], -7.0 / 4.0, rtol=1e-6)
    np.testing.assert_allclose(bias[0, 3, 0, 0], -7.0 / 256.0, rtol=1e-6)


def test_alibi_non_power_of_two_heads():
    bias = build_alibi_bias(6, 4)
    assert bias.shape == (1, 6, 1, 4)
    assert np.all(np.diff(bias[0, :, 0, 0]) != 0)  # distinct slopes


def test_mpt_forward_and_causality():
    cfg = MPTConfig().tiny()
    model = MPTForCausalLM(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), ids)["params"]
    logits = model.apply({"params": params}, ids)
    assert logits.shape == (2, 12, cfg.vocab_size)
    # causality: changing a future token must not affect earlier logits
    ids2 = ids.at[:, 8].set((ids[:, 8] + 1) % cfg.vocab_size)
    logits2 = model.apply({"params": params}, ids2)
    np.testing.assert_allclose(
        np.asarray(logits[:, :8]), np.asarray(logits2[:, :8]), atol=1e-5
    )
    assert not np.allclose(np.asarray(logits[:, 8:]), np.asarray(logits2[:, 8:]))


def test_mpt_cached_decode_matches_full_forward():
    """KV-cache decode (prefill + per-token steps) must produce the same
    logits as the teacher-forced full forward — including ALiBi parity
    (column-bias shift invariance)."""
    cfg = MPTConfig().tiny()
    model = MPTForCausalLM(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), ids)["params"]
    full = model.apply({"params": params}, ids)  # [B, S, V]

    plen = 6
    caches = model.init_cache(2, 10)
    logits_p, caches = model.apply(
        {"params": params}, ids[:, :plen], caches=caches, cache_index=0
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full[:, :plen]), atol=2e-4
    )
    for i in range(plen, 10):
        step_logits, caches = model.apply(
            {"params": params}, ids[:, i : i + 1], caches=caches, cache_index=i
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full[:, i]), atol=2e-4,
            err_msg=f"step {i}",
        )


def test_mpt_multiquery_cached_decode():
    import dataclasses

    cfg = dataclasses.replace(MPTConfig().tiny(), multiquery=True)
    model = MPTForCausalLM(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), ids)["params"]
    full = model.apply({"params": params}, ids)
    caches = model.init_cache(1, 8)
    logits_p, caches = model.apply(
        {"params": params}, ids, caches=caches, cache_index=0
    )
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full), atol=2e-4)
    assert caches[0][0].shape[2] == 1  # single shared KV head


def test_mpt_generate():
    from supir_tpu.captioner.mpt import mpt_generate

    cfg = MPTConfig().tiny()
    model = MPTForCausalLM(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 5), 1, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), ids)["params"]
    out = mpt_generate(model, params, ids, max_new_tokens=6, eos_id=0)
    assert out.shape[0] == 2 and 1 <= out.shape[1] <= 6
    assert (out >= 0).all() and (out < cfg.vocab_size).all()
    # greedy decode is deterministic
    out2 = mpt_generate(model, params, ids, max_new_tokens=6, eos_id=0)
    np.testing.assert_array_equal(out, out2)


@pytest.mark.slow
def test_prepared_conditioner_cache():
    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    z = jnp.zeros((1, 8, 8, 4))
    tok = jax.random.randint(jax.random.PRNGKey(1), (1, 77), 0, 49408)
    c1, _ = engine.prepare_condition_cached(z, tok, tok, tok, tok)
    z2 = jnp.ones((1, 8, 8, 4))
    c2, _ = engine.prepare_condition_cached(z2, tok, tok, tok, tok)
    # text embeddings are the same objects (cache hit); control differs
    assert c1["crossattn"] is c2["crossattn"]
    assert not np.array_equal(np.asarray(c1["control"]), np.asarray(c2["control"]))
