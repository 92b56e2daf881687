"""MPT decoder variant: ALiBi slopes, causal masking, forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.captioner.mpt import MPTConfig, MPTForCausalLM, build_alibi_bias
from supir_tpu.engine.factory import create_engine, tiny_test_config


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
