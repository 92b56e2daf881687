"""Captioner subsystem: Llama decode-cache consistency, vision tower
shapes, multimodal splice, caption generation end to end (tiny, random)."""

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.captioner.agent import CaptionerAgent, CaptionerConfig, vicuna_v1_prompt
from supir_tpu.captioner.llama import LlamaConfig, LlamaForCausalLM
from supir_tpu.captioner.vision import (
    CLIPVisionConfig,
    CLIPVisionTower,
    preprocess_images,
    select_patch_features,
)


def test_llama_cache_matches_full_forward():
    """Incremental decode with KV cache == full-sequence forward."""
    cfg = LlamaConfig().tiny()
    model = LlamaForCausalLM(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (2, 10), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(10), (2, 10))
    params = model.init(rng, ids, pos, method=model.forward_ids)["params"]

    embeds = model.apply({"params": params}, ids, method=model.embed)
    full_logits, _ = model.apply({"params": params}, embeds, pos)

    # prefill 6, decode 4 one at a time
    caches = model.init_cache(2, 16)
    lg, caches = model.apply(
        {"params": params}, embeds[:, :6], pos[:, :6], caches=caches, cache_index=0
    )
    np.testing.assert_allclose(np.asarray(lg[:, -1]), np.asarray(full_logits[:, 5]), atol=2e-4)
    for i in range(6, 10):
        lg, caches = model.apply(
            {"params": params}, embeds[:, i : i + 1], pos[:, i : i + 1],
            caches=caches, cache_index=i,
        )
        np.testing.assert_allclose(
            np.asarray(lg[:, 0]), np.asarray(full_logits[:, i]), atol=2e-4,
            err_msg=f"step {i}",
        )


def test_vision_tower_patch_features():
    cfg = CLIPVisionConfig().tiny()  # 56px, patch 14 -> 16 patches
    tower = CLIPVisionTower(cfg)
    x = jnp.zeros((2, 56, 56, 3))
    params = tower.init(jax.random.PRNGKey(0), x)["params"]
    hidden = tower.apply({"params": params}, x)
    assert len(hidden) == cfg.layers + 1
    feats = select_patch_features(hidden)
    assert feats.shape == (2, cfg.num_patches, cfg.width)


def test_preprocess_expand2square():
    img = np.zeros((20, 40, 3), np.uint8)
    out = preprocess_images([img], 56)
    assert out.shape == (1, 56, 56, 3)
    assert np.isfinite(out).all()


def test_vicuna_prompt():
    p = vicuna_v1_prompt("What is this?")
    assert "<image>" in p and p.endswith("ASSISTANT:")
    assert "USER:" in p


def test_caption_generation_end_to_end():
    agent = CaptionerAgent.create_random()
    img = (np.random.default_rng(0).random((30, 40, 3)) * 255).astype(np.uint8)
    caps = agent.gen_image_caption([img], temperature=0.0)
    assert len(caps) == 1
    assert isinstance(caps[0], str)
    # deterministic at temperature 0
    caps2 = agent.gen_image_caption([img], temperature=0.0)
    assert caps == caps2
