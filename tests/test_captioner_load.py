"""End-to-end CaptionerAgent.create_default from a real-HF-shaped checkpoint:
tiny-dim HF LlamaForCausalLM + CLIPVisionModel + mm_projector saved to disk
with genuine HF key names, then loaded + converted + used to caption."""

import json
import os

import jax
import numpy as np
import pytest

from supir_tpu.captioner.agent import CaptionerAgent, CaptionerConfig


@pytest.fixture(scope="module")
def hf_llava_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file
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
    )
    llama = LlamaForCausalLM(lcfg)
    vcfg = HFCLIPVisionConfig(
        hidden_size=cfg.vision.width, intermediate_size=cfg.vision.width * 4,
        num_hidden_layers=cfg.vision.layers,
        num_attention_heads=cfg.vision.heads,
        image_size=cfg.vision.image_size, patch_size=cfg.vision.patch_size,
    )
    vision = CLIPVisionModel(vcfg)
    sd = {k: v for k, v in llama.state_dict().items()}
    sd.update({
        "model.vision_tower.vision_tower." + k: v
        for k, v in vision.state_dict().items()
    })
    p0 = torch.nn.Linear(cfg.vision.width, cfg.llama.dim)
    p2 = torch.nn.Linear(cfg.llama.dim, cfg.llama.dim)
    sd.update({"model.mm_projector.0." + k: v for k, v in p0.state_dict().items()})
    sd.update({"model.mm_projector.2." + k: v for k, v in p2.state_dict().items()})

    d = tmp_path_factory.mktemp("llava_tiny")
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({
            "hidden_size": cfg.llama.dim, "num_hidden_layers": cfg.llama.layers,
            "num_attention_heads": cfg.llama.heads,
            "intermediate_size": cfg.llama.hidden_dim,
            "vocab_size": cfg.llama.vocab_size,
            "max_position_embeddings": cfg.llama.max_seq_len,
            "vision_config": {
                "image_size": cfg.vision.image_size,
                "patch_size": cfg.vision.patch_size,
                "hidden_size": cfg.vision.width,
                "num_hidden_layers": cfg.vision.layers,
                "num_attention_heads": cfg.vision.heads,
            },
        }, f)
    return str(d), cfg


def test_config_json_round_trip(hf_llava_dir):
    """create_default with NO explicit cfg: dims come from config.json."""
    d, cfg = hf_llava_dir
    agent = CaptionerAgent.create_default(weights_dir=d)
    assert agent.cfg.llama.dim == cfg.llama.dim
    assert agent.cfg.vision.width == cfg.vision.width


def test_create_default_loads_and_captions(hf_llava_dir, monkeypatch):
    d, cfg = hf_llava_dir
    monkeypatch.setattr(CaptionerAgent, "load_tokenizer", staticmethod(lambda p: None))
    agent = CaptionerAgent.create_default(weights_dir=d, cfg=cfg)
    assert agent.tokenizer is None  # byte fallback
    img = np.random.default_rng(0).integers(
        0, 255, (cfg.vision.image_size, cfg.vision.image_size, 3), dtype=np.uint8
    )
    caps = agent.gen_image_caption([img], temperature=0.0)
    assert len(caps) == 1 and isinstance(caps[0], str)


def test_load_8bit_caption_identity(hf_llava_dir, monkeypatch):
    """int8-decode caption identity: with kernels snapped to the int8 grid,
    the quantized decode path must produce the same caption as fp."""
    import jax.numpy as jnp

    d, cfg = hf_llava_dir
    monkeypatch.setattr(CaptionerAgent, "load_tokenizer", staticmethod(lambda p: None))
    agent_fp = CaptionerAgent.create_default(weights_dir=d, cfg=cfg)

    # snap every block-projection kernel onto its own int8 grid so
    # quantization is exact (round-trips losslessly)
    from supir_tpu.captioner.llama import _PROJ_NAMES
    from supir_tpu.ops.quantize import quantize_int8

    def snap(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k in _PROJ_NAMES and isinstance(v, dict) and "Dense_0" in v:
                w = jnp.asarray(v["Dense_0"]["kernel"], jnp.float32)
                q, s = quantize_int8(w)
                out[k] = {"Dense_0": {"kernel": q.astype(jnp.float32) * s}}
            else:
                out[k] = snap(v)
        return out

    agent_fp.params = dict(agent_fp.params, llama=snap(agent_fp.params["llama"]))

    img = np.random.default_rng(1).integers(
        0, 255, (cfg.vision.image_size, cfg.vision.image_size, 3), dtype=np.uint8
    )
    cap_fp = agent_fp.gen_image_caption([img], temperature=0.0)[0]

    import dataclasses as dc

    from supir_tpu.captioner.llama import quantize_llama_params

    qparams, saved = quantize_llama_params(agent_fp.params["llama"])
    assert saved > 0
    qcfg = dc.replace(cfg, llama=dc.replace(cfg.llama, quantize_int8=True))
    agent_q = CaptionerAgent(qcfg, dict(agent_fp.params, llama=qparams), tokenizer=None)
    cap_q = agent_q.gen_image_caption([img], temperature=0.0)[0]
    assert cap_q == cap_fp


def test_create_default_missing_dir_raises():
    with pytest.raises(RuntimeError, match="no captioner weights"):
        CaptionerAgent.create_default(weights_dir="/nonexistent/path")


def test_create_default_incomplete_ckpt_raises(hf_llava_dir, tmp_path, monkeypatch):
    d, cfg = hf_llava_dir
    # copy a truncated checkpoint (drop the projector)
    from safetensors.numpy import load_file, save_file

    sd = load_file(os.path.join(d, "model.safetensors"))
    sd = {k: v for k, v in sd.items() if "mm_projector" not in k}
    bad = tmp_path / "bad"
    bad.mkdir()
    save_file(sd, str(bad / "model.safetensors"))
    monkeypatch.setattr(CaptionerAgent, "load_tokenizer", staticmethod(lambda p: None))
    with pytest.raises(RuntimeError, match="incomplete"):
        CaptionerAgent.create_default(weights_dir=str(bad), cfg=cfg)
