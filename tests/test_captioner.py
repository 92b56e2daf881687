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


def test_keyword_stopper_token_suffix():
    """KeywordsStoppingCriteria parity (mm_utils.py:76-101): token-id
    suffix match, BOS stripping, start-offset scan, substring fallback."""
    from supir_tpu.captioner.conversation import KeywordStopper

    enc = {"<|im_end|>": [1, 7, 8], "###": [9]}
    st = KeywordStopper(
        ["<|im_end|>"], lambda k: enc[k], lambda ids: "", bos_id=1
    )
    assert st.keyword_ids == [[7, 8]]  # BOS stripped
    assert st.find_stop([5, 6, 7, 8]) == 2
    assert st.find_stop([5, 6, 7, 8, 3]) == 2  # match mid-sequence too
    assert st.find_stop([5, 6, 7]) is None
    # start offset: a match completing at or before `start` is old news
    assert st.find_stop([7, 8, 5, 6], start=2) is None
    assert st.find_stop([5, 7, 8, 6], start=2) == 1  # completes at e=3 > 2

    # decoded-substring fallback (context-dependent tokenization like '###')
    st2 = KeywordStopper(
        ["###"], lambda k: [2, 3], lambda ids: "some tail ### text"
    )
    assert st2.find_stop([5, 6, 7]) == 3  # cut-at-end sentinel


def test_decode_stops_on_keyword():
    """Decode halts early when the stop keyword's token ids appear
    (v0/mpt templates previously ran to max_new_tokens)."""
    from supir_tpu.captioner.conversation import KeywordStopper

    agent = CaptionerAgent.create_random()
    img = (np.random.default_rng(0).random((30, 40, 3)) * 255).astype(np.uint8)

    # greedy run without a stopper to learn the model's token stream
    feats = agent._encode_image(np.asarray(img)[None])
    emb = agent.llama.apply(
        {"params": agent.params["llama"]},
        jnp.asarray([[1, 5, 9]], jnp.int32), method=agent.llama.embed,
    )
    embeds = jnp.concatenate([emb, feats], axis=1)
    plen = embeds.shape[1]
    prefill, _, _ = agent._prefill_decode
    positions = jnp.broadcast_to(jnp.arange(plen), (1, plen))

    def run(stopper):
        caches = agent.llama.init_cache(1, agent.cfg.cache_len)
        logits, c = prefill(agent.params, embeds, positions, caches)
        tok = jnp.argmax(logits, axis=-1)
        return agent._decode_tokens(tok, plen, c, 0, 0.0, 1.0, -1, stopper)

    free, _ = run(None)
    assert free.shape[1] >= 4, "tiny model must emit a few tokens for this test"
    kw = [int(free[0, 2]), int(free[0, 3])]
    stopper = KeywordStopper(["XX"], lambda k: kw, lambda ids: "")
    seq, stop_at = run(stopper)
    assert stop_at[0] == 2  # cut where the keyword begins
    assert agent._finalize_row(seq[0], stop_at[0], -1, None) == \
        agent._detokenize([int(t) for t in free[0, :2]]).strip()


def test_finalize_row_trims_stop_str():
    agent = CaptionerAgent.create_random()
    ids = [ord(c) - 32 + 2 for c in "a cat###junk"]  # byte-fallback detok
    row = np.asarray(ids)
    out = agent._finalize_row(row, len(row), -1, "###")
    assert out == "a cat"


def test_caption_generation_end_to_end():
    agent = CaptionerAgent.create_random()
    img = (np.random.default_rng(0).random((30, 40, 3)) * 255).astype(np.uint8)
    caps = agent.gen_image_caption([img], temperature=0.0)
    assert len(caps) == 1
    assert isinstance(caps[0], str)
    # deterministic at temperature 0
    caps2 = agent.gen_image_caption([img], temperature=0.0)
    assert caps == caps2


def test_llama_int8_kv_cache_close_to_full_forward():
    """int8 KV cache (per-position/head scales, llama._quant_kv) tracks the
    full-sequence forward within quantization tolerance and keeps argmax
    decisions on a spread-out logit distribution."""
    cfg = LlamaConfig().tiny()
    model = LlamaForCausalLM(cfg)
    rng = jax.random.PRNGKey(3)
    ids = jax.random.randint(rng, (2, 10), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(10), (2, 10))
    params = model.init(rng, ids, pos, method=model.forward_ids)["params"]

    embeds = model.apply({"params": params}, ids, method=model.embed)
    full_logits, _ = model.apply({"params": params}, embeds, pos)

    caches = model.init_cache(2, 16, dtype=jnp.int8)
    assert len(caches[0]) == 4 and caches[0][0].dtype == jnp.int8
    lg, caches = model.apply(
        {"params": params}, embeds[:, :6], pos[:, :6], caches=caches, cache_index=0
    )
    scale = float(np.abs(np.asarray(full_logits)).max())
    np.testing.assert_allclose(
        np.asarray(lg[:, -1]), np.asarray(full_logits[:, 5]),
        atol=0.02 * scale,
    )
    for i in range(6, 10):
        lg, caches = model.apply(
            {"params": params}, embeds[:, i : i + 1], pos[:, i : i + 1],
            caches=caches, cache_index=i,
        )
        np.testing.assert_allclose(
            np.asarray(lg[:, 0]), np.asarray(full_logits[:, i]),
            atol=0.02 * scale, err_msg=f"step {i}",
        )


def test_fused_pairs_decode_matches_module_path():
    """LlamaConfig.fused_pairs (chained 2-GEMV decode launches,
    ops/quantize.int4_paired_fused_pair) must reproduce the module-path
    captions token for token — the XLA fallback composes identical math,
    so any drift is a wiring bug (wrong layer's params, wrong residual)."""
    import dataclasses as dc

    cfg = CaptionerConfig.tiny()
    cfg = dc.replace(cfg, llama=dc.replace(
        cfg.llama, quantize_int4=True, int4_paired=True, fused_qkv=True,
        fused_glue=True))
    agent = CaptionerAgent.create_random(cfg)
    img = (np.random.default_rng(3).random((30, 40, 3)) * 255).astype(np.uint8)
    want = agent.gen_image_caption([img], temperature=0.0)

    cfg2 = dc.replace(cfg, llama=dc.replace(cfg.llama, fused_pairs=True))
    agent2 = CaptionerAgent(cfg2, agent.params, tokenizer=agent.tokenizer)
    got = agent2.gen_image_caption([img], temperature=0.0)
    assert got == want


def test_fused_pairs_decode_matches_int8_kv_and_head():
    """fused_pairs composed with the int8 KV cache and int8 lm_head (the
    e2e bench's memory-lean captioner modes)."""
    import dataclasses as dc

    from supir_tpu.captioner.llama import quantize_llama_params

    cfg = CaptionerConfig.tiny()
    cfg = dc.replace(cfg, kv_dtype="int8", llama=dc.replace(
        cfg.llama, quantize_int4=True, int4_paired=True, fused_qkv=True,
        fused_glue=True, head_int8=True))
    base = CaptionerAgent.create_random(CaptionerConfig.tiny())
    qparams, _ = quantize_llama_params(
        base.params["llama"], bits=4, fuse=True, head_int8=True)
    params = dict(base.params, llama=qparams)
    agent = CaptionerAgent(cfg, params)
    img = (np.random.default_rng(4).random((30, 40, 3)) * 255).astype(np.uint8)
    want = agent.gen_image_caption([img], temperature=0.0)

    cfg2 = dc.replace(cfg, llama=dc.replace(cfg.llama, fused_pairs=True))
    agent2 = CaptionerAgent(cfg2, params)
    got = agent2.gen_image_caption([img], temperature=0.0)
    assert got == want
