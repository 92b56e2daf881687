"""Adversarial autoencoder training (reference
sgm/models/autoencoder.py:182-215 + losses/__init__.py:137-152): generator
and discriminator phases in one jitted step, adaptive d_weight, and the
stage-1 denoise_encoder-only mode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supir_tpu.config import VAEConfig
from supir_tpu.diffusion.ae_losses import AELossConfig
from supir_tpu.engine.ae_training import AETrainer
from supir_tpu.models.vae import AutoencoderKL


@pytest.fixture(scope="module")
def _tiny_ae_shared():
    cfg = VAEConfig().tiny()
    model = AutoencoderKL(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    return model, params


@pytest.fixture()
def tiny_ae(_tiny_ae_shared):
    # fresh param buffers per test: train_step donates its state, which
    # would delete the shared fixture's arrays
    model, params = _tiny_ae_shared
    return model, jax.tree_util.tree_map(jnp.array, params)


def _batch(seed, n=2, s=32):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 0.3, (n, s, s, 3)).astype(np.float32)
    return jnp.clip(jnp.asarray(x), -1, 1)


def test_ae_gan_training_reduces_losses(tiny_ae):
    """Both phases advance in one step; reconstruction improves over a few
    steps with the discriminator active from step 0."""
    model, params = tiny_ae
    trainer = AETrainer(
        model, AELossConfig(disc_start=0, kl_weight=1e-6),
        learning_rate=2e-4,
    )
    state = trainer.init_state(params, jax.random.PRNGKey(1), image_size=32)
    x = _batch(0)

    recs = []
    for i in range(8):
        state, m = trainer.train_step(state, x, x, jax.random.fold_in(jax.random.PRNGKey(2), i))
        recs.append(float(m["rec"]))
        assert np.isfinite(recs[-1])
        assert np.isfinite(float(m["loss_d"]))
        assert float(m["d_weight"]) >= 0.0
    assert recs[-1] < recs[0], recs
    assert int(state["step"]) == 8


def test_disc_start_gates_adversarial_terms(tiny_ae):
    """Before disc_start, the discriminator loss is zero and the generator's
    adversarial term carries no weight (reference adopt_weight gating)."""
    model, params = tiny_ae
    trainer = AETrainer(model, AELossConfig(disc_start=1000), learning_rate=1e-4)
    state = trainer.init_state(params, jax.random.PRNGKey(1), image_size=32)
    x = _batch(1)
    d0 = [np.asarray(v) for v in jax.tree_util.tree_leaves(state["disc"])]
    state, m = trainer.train_step(state, x, x, jax.random.PRNGKey(3))
    assert float(m["loss_d"]) == 0.0
    # gated adversarial term: generator loss equals rec + kl_weight*kl
    want = float(m["rec"]) + trainer.loss_cfg.kl_weight * float(m["kl"])
    np.testing.assert_allclose(float(m["loss_g"]), want, rtol=1e-5)
    # discriminator params unchanged by a zero loss (adam of zero grads)
    d1 = [np.asarray(v) for v in jax.tree_util.tree_leaves(state["disc"])]
    for a, b in zip(d0, d1):
        np.testing.assert_array_equal(a, b)


def test_denoise_encoder_branch_only_trains_that_branch(tiny_ae):
    """Stage-1 recipe: LQ->HQ training must touch ONLY the denoise_encoder
    params; encoder/decoder/quant convs stay frozen bit-for-bit."""
    model, params = tiny_ae
    trainer = AETrainer(
        model, AELossConfig(disc_start=0), learning_rate=2e-4,
        train_branch="denoise_encoder",
    )
    state = trainer.init_state(params, jax.random.PRNGKey(1), image_size=32)
    before = jax.tree_util.tree_map(np.asarray, state["gen"])
    hq = _batch(2)
    lq = jnp.clip(hq + 0.1 * jnp.asarray(
        np.random.default_rng(3).normal(size=hq.shape).astype(np.float32)), -1, 1)
    state, m = trainer.train_step(state, lq, hq, jax.random.PRNGKey(4))
    after = state["gen"]

    def max_delta(tree_a, tree_b):
        la = jax.tree_util.tree_leaves(tree_a)
        lb = jax.tree_util.tree_leaves(tree_b)
        return max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                   for a, b in zip(la, lb))

    assert max_delta(before["denoise_encoder"], after["denoise_encoder"]) > 0
    for frozen in ("encoder", "decoder", "quant_conv", "post_quant_conv"):
        assert max_delta(before[frozen], after[frozen]) == 0.0, frozen
    assert float(m["d_weight"]) == 1.0  # adaptive ratio needs a trainable decoder
