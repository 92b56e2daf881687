"""Captioner trainer: sharded step runs, loss decreases, projector-only
mode freezes the decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supir_tpu.captioner.agent import CaptionerAgent, CaptionerConfig
from supir_tpu.captioner.train import IGNORE_INDEX, CaptionerTrainer, causal_lm_loss
from supir_tpu.parallel.mesh import make_mesh


def _batch(agent, rng, b=2):
    cfg = agent.cfg
    dim = cfg.llama.dim
    p = cfg.vision.num_patches
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    pre = jax.random.normal(k1, (b, 3, dim)) * 0.02
    post = jax.random.normal(k2, (b, 5, dim)) * 0.02
    feats = jax.random.normal(k3, (b, p, cfg.vision.width))
    seq = 3 + p + 5
    labels = jax.random.randint(k4, (b, seq), 0, cfg.llama.vocab_size)
    labels = labels.at[:, : 3 + p].set(IGNORE_INDEX)  # only answer tokens count
    return {"image_feats": feats, "pre_embeds": pre, "post_embeds": post, "labels": labels}


def test_causal_lm_loss_masking():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.array([[IGNORE_INDEX, 2, IGNORE_INDEX, 3]])
    loss = causal_lm_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(8.0), rtol=1e-5)


def test_full_training_reduces_loss():
    agent = CaptionerAgent.create_random(CaptionerConfig.tiny())
    mesh = make_mesh((2, 4), ("data", "model"))
    trainer = CaptionerTrainer(agent, mesh, learning_rate=5e-3, mode="full")
    state = trainer.shard_state(trainer.init_state(agent.params))
    batch = _batch(agent, jax.random.PRNGKey(0))
    losses = []
    for _ in range(5):
        state, loss = trainer.train_step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_projector_only_freezes_llama():
    agent = CaptionerAgent.create_random(CaptionerConfig.tiny())
    mesh = make_mesh((2, 4), ("data", "model"))
    trainer = CaptionerTrainer(agent, mesh, learning_rate=5e-3, mode="projector")
    state = trainer.shard_state(trainer.init_state(agent.params))
    before = np.asarray(
        jax.tree_util.tree_leaves(agent.params["llama"])[0]
    )
    batch = _batch(agent, jax.random.PRNGKey(1))
    state, _ = trainer.train_step(state, batch)
    after = np.asarray(jax.tree_util.tree_leaves(state["params"]["llama"])[0])
    np.testing.assert_array_equal(before, after)
    # projector did move
    p_before = np.asarray(jax.tree_util.tree_leaves(agent.params["projector"])[0])
    p_after = np.asarray(jax.tree_util.tree_leaves(state["params"]["projector"])[0])
    assert not np.array_equal(p_before, p_after)


def test_lora_mode_trains_adapters_freezes_base():
    from supir_tpu.captioner.train import init_lora, merge_lora

    agent = CaptionerAgent.create_random(CaptionerConfig.tiny())
    mesh = make_mesh((2, 4), ("data", "model"))
    trainer = CaptionerTrainer(agent, mesh, learning_rate=5e-3, mode="lora",
                               lora_rank=4, lora_alpha=8.0)
    state = trainer.shard_state(trainer.init_state(agent.params))
    # b starts at zero: merged params == base params at init
    merged0 = merge_lora(state["params"]["llama"], state["params"]["lora"], 8.0, 4)
    base_leaf = np.asarray(jax.tree_util.tree_leaves(agent.params["llama"])[0])
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(merged0)[0]), base_leaf, atol=1e-6
    )

    batch = _batch(agent, jax.random.PRNGKey(2))
    losses = []
    for _ in range(5):
        state, loss = trainer.train_step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # base llama weights untouched
    after = np.asarray(jax.tree_util.tree_leaves(state["params"]["llama"])[0])
    np.testing.assert_array_equal(base_leaf, after)
    # adapters moved
    b_leaves = [np.asarray(v) for v in jax.tree_util.tree_leaves(state["params"]["lora"])]
    assert any(np.abs(v).sum() > 0 for v in b_leaves)


@pytest.mark.heavy
def test_ucg_rate_dropout():
    from supir_tpu.engine.factory import create_engine, tiny_test_config

    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    tok = jax.random.randint(jax.random.PRNGKey(1), (8, 77), 0, 100)
    size = jnp.full((8, 2), 64.0)

    def run(**kw):
        return engine.conditioner.apply(
            {"params": engine.params["conditioner"]}, tok, tok, size, size, size, **kw
        )

    base = run()
    same = run(ucg_rng=jax.random.PRNGKey(3), ucg_rates=(0.0,) * 5)
    np.testing.assert_array_equal(
        np.asarray(base["crossattn"]), np.asarray(same["crossattn"])
    )
    dropped = run(ucg_rng=jax.random.PRNGKey(3), ucg_rates=(0.5, 0.5, 0.5, 0.5, 0.5))
    ca = np.asarray(dropped["crossattn"])
    d_l = ca[..., : cond_cfg.clip_l.width]
    # with rate .5 over 8 samples, some rows zeroed, some kept (per embedder)
    row_zero = np.all(d_l == 0, axis=(1, 2))
    assert 0 < row_zero.sum() < 8
    # zeroing is per-embedder: a sample can keep clip_l but drop bigG
    d_g = ca[..., cond_cfg.clip_l.width:]
    row_zero_g = np.all(d_g == 0, axis=(1, 2))
    assert not np.array_equal(row_zero, row_zero_g)
