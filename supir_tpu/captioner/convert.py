"""Captioner weight conversion: HF llava-v1.5 (torch) -> supir-tpu pytree.

Key namespaces (HF LlavaLlamaForCausalLM):
  model.embed_tokens / model.layers.{i}.* / model.norm / lm_head -> llama
  model.vision_tower.vision_tower.vision_model.*                 -> vision
  model.mm_projector.{0,2}.*                                     -> projector

Reuses the rule machinery + coverage report of supir_tpu.utils.ckpt.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from supir_tpu.captioner.agent import CaptionerConfig
from supir_tpu.utils.ckpt import (
    ConversionReport,
    Rule,
    _dense,
    _ln,
    apply_rules,
)


def llama_rules(cfg) -> List[Rule]:
    tk = "model"
    rules: List[Rule] = [
        (f"{tk}.embed_tokens.weight", ("embed_tokens", "embedding"), None),
        (f"{tk}.norm.weight", ("model", "norm", "weight"), None),
    ]
    rules += _dense("lm_head", ("lm_head",), bias=False)
    for i in range(cfg.layers):
        lt = f"{tk}.layers.{i}"
        lf = ("model", f"layer_{i}")
        for p in ("q", "k", "v"):
            rules += _dense(f"{lt}.self_attn.{p}_proj", lf + (f"{p}_proj",), bias=False)
        rules += _dense(f"{lt}.self_attn.o_proj", lf + ("o_proj",), bias=False)
        for p in ("gate", "up", "down"):
            rules += _dense(f"{lt}.mlp.{p}_proj", lf + (f"{p}_proj",), bias=False)
        rules.append((f"{lt}.input_layernorm.weight", lf + ("input_norm", "weight"), None))
        rules.append((f"{lt}.post_attention_layernorm.weight", lf + ("post_norm", "weight"), None))
    return rules


def vision_rules(cfg) -> List[Rule]:
    tk = "model.vision_tower.vision_tower.vision_model"
    rules: List[Rule] = [
        (f"{tk}.embeddings.class_embedding", ("class_embedding",), None),
        (f"{tk}.embeddings.position_embedding.weight", ("positional_embedding",), None),
        (f"{tk}.embeddings.patch_embedding.weight", ("patch_embedding", "kernel"), "conv"),
    ]
    # HF's layer is spelled "pre_layrnorm"
    rules += [
        (f"{tk}.pre_layrnorm.weight", ("pre_layernorm", "scale"), None),
        (f"{tk}.pre_layrnorm.bias", ("pre_layernorm", "bias"), None),
    ]
    for i in range(cfg.layers):
        lt = f"{tk}.encoder.layers.{i}"
        lf = (f"block_{i}",)
        for p in ("q", "k", "v", "out"):
            rules += _dense(f"{lt}.self_attn.{p}_proj", lf + ("attn", f"{p}_proj"))
        rules += _ln(f"{lt}.layer_norm1", lf + ("ln_1",))
        rules += _ln(f"{lt}.layer_norm2", lf + ("ln_2",))
        rules += _dense(f"{lt}.mlp.fc1", lf + ("mlp_fc1",))
        rules += _dense(f"{lt}.mlp.fc2", lf + ("mlp_fc2",))
    return rules


def projector_rules() -> List[Rule]:
    return _dense("model.mm_projector.0", ("fc1",)) + _dense(
        "model.mm_projector.2", ("fc2",)
    )


def convert_captioner_state_dict(
    torch_sd: Dict, cfg: CaptionerConfig
) -> Tuple[Dict, ConversionReport]:
    report = ConversionReport()
    used: set = set()
    params = {"llama": {}, "vision": {}, "projector": {}}
    apply_rules(torch_sd, llama_rules(cfg.llama), params["llama"], report, used)
    apply_rules(torch_sd, vision_rules(cfg.vision), params["vision"], report, used)
    apply_rules(torch_sd, projector_rules(), params["projector"], report, used)
    report.unused = sorted(k for k in torch_sd if k not in used)
    return params, report


def load_captioner_checkpoint(path_or_dir: str, cfg: CaptionerConfig):
    """Load HF llava weights from a safetensors file/dir and convert."""
    import os

    from supir_tpu.utils.ckpt import load_torch_file

    sd = {}
    if os.path.isdir(path_or_dir):
        for f in sorted(os.listdir(path_or_dir)):
            if f.endswith((".safetensors", ".bin")):
                sd.update(load_torch_file(os.path.join(path_or_dir, f)))
    else:
        sd = load_torch_file(path_or_dir)
    return convert_captioner_state_dict(sd, cfg)


def mpt_rules(cfg) -> List[Rule]:
    """Reference MPT key space (modeling_mpt.py: transformer.wte /
    transformer.blocks.{i}.{norm_1,attn.Wqkv,attn.out_proj,norm_2,
    ffn.up_proj,ffn.down_proj} / transformer.norm_f) -> our MPT tree."""
    tk = "transformer"
    rules: List[Rule] = [
        (f"{tk}.wte.weight", ("wte", "embedding"), None),
        (f"{tk}.norm_f.weight", ("norm_f", "ln", "scale"), None),
        (f"{tk}.norm_f.bias", ("norm_f", "ln", "bias"), None),
    ]
    for i in range(cfg.n_layers):
        lt = f"{tk}.blocks.{i}"
        lf = (f"block_{i}",)
        for n in ("norm_1", "norm_2"):
            rules.append((f"{lt}.{n}.weight", lf + (n, "ln", "scale"), None))
            rules.append((f"{lt}.{n}.bias", lf + (n, "ln", "bias"), None))
        rules += _dense(f"{lt}.attn.Wqkv", lf + ("Wqkv",), bias=False)
        rules += _dense(f"{lt}.attn.out_proj", lf + ("out_proj",), bias=False)
        rules += _dense(f"{lt}.ffn.up_proj", lf + ("up_proj",), bias=False)
        rules += _dense(f"{lt}.ffn.down_proj", lf + ("down_proj",), bias=False)
    return rules


def convert_mpt_state_dict(torch_sd: Dict, cfg) -> Tuple[Dict, ConversionReport]:
    """torch MPT state dict -> MPTForCausalLM params. The no_bias=True
    checkpoint family (mpt-7b etc.) strips LayerNorm biases too
    (modeling_mpt.py no_bias loop); those are filled with zeros here
    instead of reported missing."""
    import numpy as np

    report = ConversionReport()
    used: set = set()
    params: Dict = {}
    apply_rules(torch_sd, mpt_rules(cfg), params, report, used)
    still_missing = []
    for m in report.missing:
        tkey, fpath = m.split(" -> ")
        if tkey.endswith(".bias") and "/ln/" in fpath:
            node = params
            parts = fpath.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = np.zeros((cfg.d_model,), np.float32)
            report.filled += 1
        else:
            still_missing.append(m)
    report.missing = still_missing
    report.unused = sorted(k for k in torch_sd if k not in used)
    return params, report
