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
