"""Captioner torch-golden numeric parity vs the in-image HF modules.

The diffusion side has torch goldens at every level (tests/ref_oracle.py);
this file is the same proof for the captioner — the stack the reference
builds from HF transformers (`llava/model/language_model/llava_llama.py:41`,
`llava/model/multimodal_encoder/clip_encoder.py:35-46`, and the embedding
splice `llava/model/llava_arch.py:95-213`):

  (a) converted JAX Llama logits == HF LlamaForCausalLM logits (fp32)
  (b) vision-tower layer -2 patch features == HF CLIPVisionModel
  (c) mm projector output == torch Linear/GELU/Linear
  (d) greedy-decode token-sequence EQUALITY through gen_image_caption
      vs HF generate on the identically spliced embeds

A silent rotary/RMSNorm/splice-order/activation drift fails these.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from supir_tpu.captioner.agent import CaptionerAgent, CaptionerConfig  # noqa: E402
from supir_tpu.captioner.convert import convert_captioner_state_dict  # noqa: E402
from supir_tpu.captioner.vision import preprocess_images, select_patch_features  # noqa: E402


@pytest.fixture(scope="module")
def golden():
    """torch modules + converted JAX agent sharing one set of weights."""
    from transformers import (
        CLIPVisionConfig as HFCLIPVisionConfig,
        CLIPVisionModel,
        LlamaConfig as HFLlamaConfig,
        LlamaForCausalLM,
    )

    cfg = CaptionerConfig.tiny()
    torch.manual_seed(0)
    lcfg = HFLlamaConfig(
        vocab_size=cfg.llama.vocab_size, hidden_size=cfg.llama.dim,
        intermediate_size=cfg.llama.hidden_dim,
        num_hidden_layers=cfg.llama.layers,
        num_attention_heads=cfg.llama.heads,
        num_key_value_heads=cfg.llama.kv_heads,
        max_position_embeddings=cfg.llama.max_seq_len,
        rms_norm_eps=cfg.llama.rms_eps,
        rope_theta=cfg.llama.rope_theta,
    )
    llama = LlamaForCausalLM(lcfg).eval().float()
    vcfg = HFCLIPVisionConfig(
        hidden_size=cfg.vision.width, intermediate_size=cfg.vision.width * 4,
        num_hidden_layers=cfg.vision.layers,
        num_attention_heads=cfg.vision.heads,
        image_size=cfg.vision.image_size, patch_size=cfg.vision.patch_size,
    )
    vision = CLIPVisionModel(vcfg).eval().float()
    # mm projector exactly as the reference builds it: Linear/GELU/Linear
    # (llava/model/multimodal_projector/builder.py, mlp2x_gelu)
    proj = torch.nn.Sequential(
        torch.nn.Linear(cfg.vision.width, cfg.llama.dim),
        torch.nn.GELU(),
        torch.nn.Linear(cfg.llama.dim, cfg.llama.dim),
    ).eval().float()

    sd = {k: v.detach().numpy() for k, v in llama.state_dict().items()}
    sd.update({
        "model.vision_tower.vision_tower." + k: v.detach().numpy()
        for k, v in vision.state_dict().items()
    })
    sd.update({"model.mm_projector.0." + k: v.detach().numpy()
               for k, v in proj[0].state_dict().items()})
    sd.update({"model.mm_projector.2." + k: v.detach().numpy()
               for k, v in proj[2].state_dict().items()})

    params, report = convert_captioner_state_dict(sd, cfg)
    assert not report.missing, report.missing[:5]
    agent = CaptionerAgent(cfg, jax.tree_util.tree_map(jnp.asarray, params))
    return agent, llama, vision, proj, cfg


def test_vision_tower_layer_minus2_golden(golden):
    """(b) layer -2 patch features vs HF CLIPVisionModel hidden_states
    (ref clip_encoder.py:35-46: output_hidden_states, CLS dropped)."""
    agent, _, vision, _, cfg = golden
    rng = np.random.default_rng(1)
    s = cfg.vision.image_size
    pixels = rng.normal(size=(2, s, s, 3)).astype(np.float32)

    ours = agent.vision.apply({"params": agent.params["vision"]}, jnp.asarray(pixels))
    ours = np.asarray(select_patch_features(ours, cfg.mm_hidden_layer))

    with torch.no_grad():
        hf = vision(
            torch.from_numpy(pixels).permute(0, 3, 1, 2), output_hidden_states=True
        ).hidden_states[cfg.mm_hidden_layer][:, 1:]
    np.testing.assert_allclose(ours, hf.numpy(), atol=2e-4, rtol=2e-4)


def test_projector_golden(golden):
    """(c) mlp2x_gelu projector — torch nn.GELU is the EXACT erf gelu."""
    agent, _, _, proj, cfg = golden
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(1, cfg.vision.num_patches, cfg.vision.width)).astype(np.float32)
    ours = np.asarray(
        agent.projector.apply({"params": agent.params["projector"]}, jnp.asarray(feats))
    )
    with torch.no_grad():
        hf = proj(torch.from_numpy(feats))
    np.testing.assert_allclose(ours, hf.numpy(), atol=1e-5, rtol=1e-5)


def test_llama_logits_golden(golden):
    """(a) full-sequence logits on token ids, no cache (fp32)."""
    agent, llama, _, _, cfg = golden
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.llama.vocab_size, (2, 17), dtype=np.int64)
    positions = jnp.broadcast_to(jnp.arange(17), (2, 17))
    ours, _ = agent.llama.apply(
        {"params": agent.params["llama"]}, jnp.asarray(ids, jnp.int32), positions,
        method=agent.llama.forward_ids,
    )
    with torch.no_grad():
        hf = llama(torch.from_numpy(ids)).logits
    np.testing.assert_allclose(np.asarray(ours), hf.numpy(), atol=2e-4, rtol=2e-4)


def test_llama_prefill_cache_logits_golden(golden):
    """Prefill path (cache_index=0 causal fast path) last-token logits
    match HF — the path gen_image_caption actually runs."""
    agent, llama, _, _, cfg = golden
    rng = np.random.default_rng(4)
    ids = rng.integers(0, cfg.llama.vocab_size, (1, 13), dtype=np.int64)
    embeds = agent._embed_jit(agent.params, jnp.asarray(ids, jnp.int32))
    caches = agent.llama.init_cache(1, cfg.cache_len, dtype=agent._kv_dtype)
    prefill, _, _ = agent._prefill_decode
    positions = jnp.broadcast_to(jnp.arange(13), (1, 13))
    last, _ = prefill(agent.params, embeds, positions, caches)
    with torch.no_grad():
        hf = llama(torch.from_numpy(ids)).logits[:, -1]
    np.testing.assert_allclose(np.asarray(last), hf.numpy(), atol=2e-4, rtol=2e-4)


def _spliced_embeds_torch(agent, llama, vision, proj, pre_ids, post_ids, pixels):
    """Reference splice (llava_arch.py:95-213): [embed(pre); proj(vision
    layer -2 patches); embed(post)] — built entirely from torch modules."""
    with torch.no_grad():
        hs = vision(
            torch.from_numpy(pixels).permute(0, 3, 1, 2), output_hidden_states=True
        ).hidden_states[agent.cfg.mm_hidden_layer][:, 1:]
        img = proj(hs)
        emb = llama.get_input_embeddings()
        pre = emb(torch.tensor(pre_ids)[None])
        post = emb(torch.tensor(post_ids)[None])
        return torch.cat([pre, img, post], dim=1)


def test_spliced_logits_golden(golden):
    """(a)+(b)+(c) composed: logits after the image-embedding splice."""
    agent, llama, vision, proj, cfg = golden
    rng = np.random.default_rng(5)
    s = cfg.vision.image_size
    img = rng.integers(0, 255, (s, s, 3), dtype=np.uint8)
    pixels = preprocess_images([img], s)
    pre_ids = [1, 5, 9]
    post_ids = [7, 3]

    img_embeds = agent._encode_jit(agent.params, jnp.asarray(pixels))
    emb = lambda ids: agent._embed_jit(agent.params, jnp.asarray(ids, jnp.int32)[None])
    embeds = jnp.concatenate([emb(pre_ids), img_embeds, emb(post_ids)], axis=1)
    plen = embeds.shape[1]
    positions = jnp.broadcast_to(jnp.arange(plen), (1, plen))
    ours, _ = agent.llama.apply({"params": agent.params["llama"]}, embeds, positions)

    t_embeds = _spliced_embeds_torch(agent, llama, vision, proj, pre_ids, post_ids, pixels)
    with torch.no_grad():
        hf = llama(inputs_embeds=t_embeds).logits
    np.testing.assert_allclose(np.asarray(ours), hf.numpy(), atol=5e-4, rtol=5e-4)


def test_greedy_decode_token_equality(golden, monkeypatch):
    """(d) greedy token sequence THROUGH gen_image_caption == HF generate
    on the identically spliced embeds (ref llava_agent.py:81-90 generate)."""
    agent, llama, vision, proj, cfg = golden
    rng = np.random.default_rng(6)
    s = cfg.vision.image_size
    img = rng.integers(0, 255, (s, s, 3), dtype=np.uint8)

    # capture the raw token matrix produced inside gen_image_caption
    captured = {}
    real = CaptionerAgent._decode_tokens

    def record(self, *a, **kw):
        seqs, stop_at = real(self, *a, **kw)
        captured["seqs"] = seqs
        return seqs, stop_at

    monkeypatch.setattr(CaptionerAgent, "_decode_tokens", record)
    question = "Describe this image."
    caps = agent.gen_image_caption([img], temperature=0.0, qs=question)
    assert len(caps) == 1
    ours = captured["seqs"][0]

    # torch side: identical prompt split + tokenization (byte fallback) +
    # splice, then HF greedy generate
    from supir_tpu.captioner.conversation import build_prompt

    prompt = build_prompt("vicuna_v1", question)
    pre, post = prompt.split("<image>")
    pre_ids = agent._tokenize(pre)
    post_ids = agent._tokenize(post)  # tokenizer is None: no BOS strip
    pixels = preprocess_images([img], s)
    t_embeds = _spliced_embeds_torch(agent, llama, vision, proj, pre_ids, post_ids, pixels)
    with torch.no_grad():
        out = llama.generate(
            inputs_embeds=t_embeds,
            attention_mask=torch.ones(t_embeds.shape[:2], dtype=torch.long),
            do_sample=False, max_new_tokens=cfg.max_new_tokens,
            eos_token_id=2, pad_token_id=0,
        )[0].tolist()

    n = min(len(ours), len(out))
    assert n >= 1
    assert list(map(int, ours[:n])) == out[:n], (
        f"greedy decode drifted: ours={list(map(int, ours[:n]))} hf={out[:n]}"
    )
