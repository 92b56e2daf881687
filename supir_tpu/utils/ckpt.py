"""Checkpoint conversion: PyTorch SUPIR/SDXL state dicts -> supir-tpu pytree.

Replaces the reference's layered non-strict `load_state_dict` merge
(`SUPIR/util.py:34-51`: SDXL base safetensors, then SUPIR-v0Q/F over it)
with an explicit key-mapped conversion that produces a coverage report —
every torch key either maps to a flax leaf or is listed as unused, and
every flax leaf is either filled or listed as missing.

Torch key namespaces (reference model tree):
  model.diffusion_model.*       -> params['unet']    (LightGLVUNet)
  model.control_model.*         -> params['control'] (GLVControl)
  first_stage_model.*           -> params['vae']
  conditioner.embedders.0.*     -> params['conditioner']['clip_l']
  conditioner.embedders.1.*     -> params['conditioner']['clip_bigg']

Transforms: Linear [out,in]->[in,out] transpose; Conv OIHW->HWIO;
GroupNorm/LayerNorm weight->scale; OpenCLIP packed qkv split.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Iterable, List, Optional, Tuple

import numpy as np

from supir_tpu.config import ControlConfig, SUPIRConfig, UNetConfig, VAEConfig


# --------------------------------------------------------------------------
# low-level transforms

def t_linear(w):
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def t_conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _as_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v, np.float32)


# --------------------------------------------------------------------------
# mapping construction: emit (torch_key, flax_path, transform) triples

Rule = Tuple[str, Tuple[str, ...], Optional[str]]  # torch key, flax path, kind


def _dense(tk: str, fp: Tuple[str, ...], bias=True) -> List[Rule]:
    rules = [(f"{tk}.weight", fp + ("Dense_0", "kernel"), "linear")]
    if bias:
        rules.append((f"{tk}.bias", fp + ("Dense_0", "bias"), None))
    return rules


def _conv(tk: str, fp: Tuple[str, ...]) -> List[Rule]:
    return [
        (f"{tk}.weight", fp + ("Conv_0", "kernel"), "conv"),
        (f"{tk}.bias", fp + ("Conv_0", "bias"), None),
    ]


def _norm(tk: str, fp: Tuple[str, ...]) -> List[Rule]:
    return [
        (f"{tk}.weight", fp + ("scale",), None),
        (f"{tk}.bias", fp + ("bias",), None),
    ]


def _ln(tk: str, fp: Tuple[str, ...]) -> List[Rule]:
    return [
        (f"{tk}.weight", fp + ("scale",), None),
        (f"{tk}.bias", fp + ("bias",), None),
    ]


def _resblock(tk: str, fp: Tuple[str, ...], has_skip: bool) -> List[Rule]:
    rules = []
    rules += _norm(f"{tk}.in_layers.0", fp + ("in_norm",))
    rules += _conv(f"{tk}.in_layers.2", fp + ("in_conv",))
    rules += _dense(f"{tk}.emb_layers.1", fp + ("emb_proj",))
    rules += _norm(f"{tk}.out_layers.0", fp + ("out_norm",))
    rules += _conv(f"{tk}.out_layers.3", fp + ("out_conv",))
    if has_skip:
        rules += _conv(f"{tk}.skip_connection", fp + ("skip",))
    return rules


def _btb(tk: str, fp: Tuple[str, ...]) -> List[Rule]:
    """BasicTransformerBlock."""
    rules = []
    for a in ("attn1", "attn2"):
        rules += _dense(f"{tk}.{a}.to_q", fp + (a, "to_q"), bias=False)
        rules += _dense(f"{tk}.{a}.to_k", fp + (a, "to_k"), bias=False)
        rules += _dense(f"{tk}.{a}.to_v", fp + (a, "to_v"), bias=False)
        rules += _dense(f"{tk}.{a}.to_out.0", fp + (a, "to_out"))
    rules += _dense(f"{tk}.ff.net.0.proj", fp + ("ff", "geglu", "proj"))
    rules += _dense(f"{tk}.ff.net.2", fp + ("ff", "proj_out"))
    for n in ("norm1", "norm2", "norm3"):
        rules += _ln(f"{tk}.{n}", fp + (n,))
    return rules


def _spatial_transformer(tk: str, fp: Tuple[str, ...], depth: int) -> List[Rule]:
    rules = []
    rules += _norm(f"{tk}.norm", fp + ("norm",))
    rules += _dense(f"{tk}.proj_in", fp + ("proj_in",))
    for d in range(depth):
        rules += _btb(f"{tk}.transformer_blocks.{d}", fp + (f"block_{d}",))
    rules += _dense(f"{tk}.proj_out", fp + ("proj_out",))
    return rules


def _time_embed(tk_prefix: str, fp: Tuple[str, ...], with_label: bool) -> List[Rule]:
    rules = []
    rules += _dense(f"{tk_prefix}time_embed.0", fp + ("time", "time_embed", "fc1"))
    rules += _dense(f"{tk_prefix}time_embed.2", fp + ("time", "time_embed", "fc2"))
    if with_label:
        rules += _dense(f"{tk_prefix}label_emb.0.0", fp + ("time", "label_emb", "fc1"))
        rules += _dense(f"{tk_prefix}label_emb.0.2", fp + ("time", "label_emb", "fc2"))
    return rules


def unet_encoder_rules(cfg: UNetConfig, tk: str, fp: Tuple[str, ...]) -> List[Rule]:
    """input_blocks + middle_block under torch prefix `tk`, flax scope `fp`."""
    rules = _conv(f"{tk}input_blocks.0.0", fp + ("conv_in",))
    ch = cfg.model_channels
    ds = 1
    i = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            out_ch = mult * cfg.model_channels
            rules += _resblock(f"{tk}input_blocks.{i}.0", fp + (f"in_{i}_res",), has_skip=(ch != out_ch))
            ch = out_ch
            if ds in cfg.attention_resolutions:
                rules += _spatial_transformer(
                    f"{tk}input_blocks.{i}.1", fp + (f"in_{i}_attn",), cfg.transformer_depth[level]
                )
            i += 1
        if level != cfg.levels - 1:
            rules += _conv(f"{tk}input_blocks.{i}.0.op", fp + (f"in_{i}_down", "conv"))
            i += 1
            ds *= 2
    rules += _resblock(f"{tk}middle_block.0", fp + ("mid_res1",), has_skip=False)
    rules += _spatial_transformer(f"{tk}middle_block.1", fp + ("mid_attn",), cfg.middle_depth)
    rules += _resblock(f"{tk}middle_block.2", fp + ("mid_res2",), has_skip=False)
    return rules


def unet_decoder_rules(
    cfg: UNetConfig, tk: str, fp: Tuple[str, ...], skip_channels: List[int]
) -> List[Rule]:
    """output_blocks + out head. skip_channels: encoder feature channels."""
    rules: List[Rule] = []
    skips = list(skip_channels)
    ch = cfg.model_channels * cfg.channel_mult[-1]
    ds = 2 ** (cfg.levels - 1)
    i = 0
    for rlevel, mult in enumerate(reversed(cfg.channel_mult)):
        level = cfg.levels - 1 - rlevel
        out_ch = mult * cfg.model_channels
        for blk in range(cfg.num_res_blocks + 1):
            ich = skips.pop()
            rules += _resblock(
                f"{tk}output_blocks.{i}.0", fp + (f"out_{i}_res",), has_skip=(ch + ich != out_ch)
            )
            ch = out_ch
            mod_idx = 1
            if ds in cfg.attention_resolutions:
                rules += _spatial_transformer(
                    f"{tk}output_blocks.{i}.{mod_idx}", fp + (f"out_{i}_attn",), cfg.transformer_depth[level]
                )
                mod_idx += 1
            if level > 0 and blk == cfg.num_res_blocks:
                rules += _conv(f"{tk}output_blocks.{i}.{mod_idx}.conv", fp + (f"out_{i}_up", "conv"))
                ds //= 2
            i += 1
    rules += _norm(f"{tk}out.0", fp + ("out", "norm"))
    rules += _conv(f"{tk}out.2", fp + ("out", "conv"))
    return rules


def zero_sft_rules(tk: str, fp: Tuple[str, ...]) -> List[Rule]:
    rules = []
    rules += _norm(f"{tk}.param_free_norm", fp + ("norm",))
    rules += _conv(f"{tk}.mlp_shared.0", fp + ("mlp_shared",))
    rules += _conv(f"{tk}.zero_mul", fp + ("zero_mul",))
    rules += _conv(f"{tk}.zero_add", fp + ("zero_add",))
    rules += _conv(f"{tk}.zero_conv", fp + ("zero_conv",))
    return rules


def zero_xattn_rules(tk: str, fp: Tuple[str, ...]) -> List[Rule]:
    rules = []
    rules += _dense(f"{tk}.attn.to_q", fp + ("attn", "to_q"), bias=False)
    rules += _dense(f"{tk}.attn.to_k", fp + ("attn", "to_k"), bias=False)
    rules += _dense(f"{tk}.attn.to_v", fp + ("attn", "to_v"), bias=False)
    rules += _dense(f"{tk}.attn.to_out.0", fp + ("attn", "to_out"))
    rules += _norm(f"{tk}.norm1", fp + ("norm1",))
    rules += _norm(f"{tk}.norm2", fp + ("norm2",))
    return rules


def light_glv_unet_rules(cfg: UNetConfig, ctrl: ControlConfig) -> List[Rule]:
    """model.diffusion_model.* -> params['unet'] (root scope)."""
    from supir_tpu.models.control import _build_adapter_specs
    from supir_tpu.models.unet import encoder_feature_channels

    tk = "model.diffusion_model."
    rules = _time_embed(tk, (), with_label=cfg.adm_in_channels is not None)
    rules += unet_encoder_rules(cfg, tk, ("enc",))
    rules += unet_decoder_rules(cfg, tk, (), encoder_feature_channels(cfg))
    specs = _build_adapter_specs(ctrl)
    for pos, (kind, _i) in enumerate(specs):
        base = f"{tk}project_modules.{pos}"
        if kind == "sft":
            rules += zero_sft_rules(base, (f"proj_{pos}",))
        else:
            rules += zero_xattn_rules(base, (f"proj_{pos}",))
    return rules


def glv_control_rules(cfg: UNetConfig) -> List[Rule]:
    """model.control_model.* -> params['control']."""
    tk = "model.control_model."
    rules = _time_embed(tk, (), with_label=cfg.adm_in_channels is not None)
    rules += unet_encoder_rules(cfg, tk, ("enc",))
    rules += _conv(f"{tk}input_hint_block.0", ("input_hint_block",))
    return rules


def plain_unet_rules(cfg: UNetConfig, tk: str = "model.diffusion_model.") -> List[Rule]:
    """Plain SDXL UNetModel (txt2img): enc/dec scoped."""
    from supir_tpu.models.unet import encoder_feature_channels

    rules = _time_embed(tk, (), with_label=cfg.adm_in_channels is not None)
    rules += unet_encoder_rules(cfg, tk, ("enc",))
    rules += unet_decoder_rules(cfg, tk, ("dec",), encoder_feature_channels(cfg))
    # out head lives at root in UNetModel too ('out' name) — decoder rules
    # already emit ('dec', 'out', ...) which is wrong for UNetModel; fix up:
    fixed = []
    for k, fp, kind in rules:
        if fp[:2] == ("dec", "out") and fp[1] == "out":
            fp = ("out",) + fp[2:]
        fixed.append((k, fp, kind))
    return fixed


def _vae_resblock(tk: str, fp: Tuple[str, ...], has_nin: bool) -> List[Rule]:
    rules = []
    rules += _norm(f"{tk}.norm1", fp + ("norm1",))
    rules += _conv(f"{tk}.conv1", fp + ("conv1",))
    rules += _norm(f"{tk}.norm2", fp + ("norm2",))
    rules += _conv(f"{tk}.conv2", fp + ("conv2",))
    if has_nin:
        rules += _conv(f"{tk}.nin_shortcut", fp + ("nin_shortcut",))
    return rules


def _vae_attn(tk: str, fp: Tuple[str, ...]) -> List[Rule]:
    rules = []
    rules += _norm(f"{tk}.norm", fp + ("norm",))
    for n in ("q", "k", "v", "proj_out"):
        rules += _conv(f"{tk}.{n}", fp + (n,))
    return rules


def vae_encoder_rules(cfg: VAEConfig, tk: str, fp: Tuple[str, ...]) -> List[Rule]:
    rules = _conv(f"{tk}.conv_in", fp + ("conv_in",))
    ch = cfg.ch
    for level, mult in enumerate(cfg.ch_mult):
        out_ch = cfg.ch * mult
        for i in range(cfg.num_res_blocks):
            rules += _vae_resblock(
                f"{tk}.down.{level}.block.{i}", fp + (f"down_{level}_block_{i}",), has_nin=(ch != out_ch)
            )
            ch = out_ch
        if level != len(cfg.ch_mult) - 1:
            rules += _conv(f"{tk}.down.{level}.downsample.conv", fp + (f"down_{level}_downsample",))
    rules += _vae_resblock(f"{tk}.mid.block_1", fp + ("mid_block_1",), has_nin=False)
    rules += _vae_attn(f"{tk}.mid.attn_1", fp + ("mid_attn_1",))
    rules += _vae_resblock(f"{tk}.mid.block_2", fp + ("mid_block_2",), has_nin=False)
    rules += _norm(f"{tk}.norm_out", fp + ("norm_out",))
    rules += _conv(f"{tk}.conv_out", fp + ("conv_out",))
    return rules


def vae_decoder_rules(cfg: VAEConfig, tk: str, fp: Tuple[str, ...]) -> List[Rule]:
    rules = _conv(f"{tk}.conv_in", fp + ("conv_in",))
    rules += _vae_resblock(f"{tk}.mid.block_1", fp + ("mid_block_1",), has_nin=False)
    rules += _vae_attn(f"{tk}.mid.attn_1", fp + ("mid_attn_1",))
    rules += _vae_resblock(f"{tk}.mid.block_2", fp + ("mid_block_2",), has_nin=False)
    ch = cfg.ch * cfg.ch_mult[-1]
    for rlevel, mult in enumerate(reversed(cfg.ch_mult)):
        level = len(cfg.ch_mult) - 1 - rlevel
        out_ch = cfg.ch * mult
        for i in range(cfg.num_res_blocks + 1):
            rules += _vae_resblock(
                f"{tk}.up.{level}.block.{i}", fp + (f"up_{level}_block_{i}",), has_nin=(ch != out_ch)
            )
            ch = out_ch
        if level != 0:
            rules += _conv(f"{tk}.up.{level}.upsample.conv", fp + (f"up_{level}_upsample",))
    rules += _norm(f"{tk}.norm_out", fp + ("norm_out",))
    rules += _conv(f"{tk}.conv_out", fp + ("conv_out",))
    return rules


def vae_rules(cfg: VAEConfig, with_denoise_encoder: bool = True) -> List[Rule]:
    tk = "first_stage_model"
    rules = vae_encoder_rules(cfg, f"{tk}.encoder", ("encoder",))
    rules += vae_decoder_rules(cfg, f"{tk}.decoder", ("decoder",))
    rules += _conv(f"{tk}.quant_conv", ("quant_conv",))
    rules += _conv(f"{tk}.post_quant_conv", ("post_quant_conv",))
    if with_denoise_encoder:
        rules += vae_encoder_rules(cfg, f"{tk}.denoise_encoder", ("denoise_encoder",))
    return rules


def clip_l_rules(layers: int = 12) -> List[Rule]:
    """HF CLIP-L text tower (conditioner.embedders.0.transformer.text_model)."""
    tk = "conditioner.embedders.0.transformer.text_model"
    fp = ("clip_l",)
    rules = [
        (f"{tk}.embeddings.token_embedding.weight", fp + ("token_embedding", "embedding"), None),
        (f"{tk}.embeddings.position_embedding.weight", fp + ("positional_embedding",), None),
    ]
    for i in range(layers):
        lt = f"{tk}.encoder.layers.{i}"
        lf = fp + (f"block_{i}",)
        for p in ("q", "k", "v", "out"):
            rules += _dense(f"{lt}.self_attn.{p}_proj", lf + ("attn", f"{p}_proj"))
        rules += _ln(f"{lt}.layer_norm1", lf + ("ln_1",))
        rules += _ln(f"{lt}.layer_norm2", lf + ("ln_2",))
        rules += _dense(f"{lt}.mlp.fc1", lf + ("mlp_fc1",))
        rules += _dense(f"{lt}.mlp.fc2", lf + ("mlp_fc2",))
    rules += _ln(f"{tk}.final_layer_norm", fp + ("ln_final",))
    return rules


def clip_bigg_rules(layers: int = 32) -> List[Rule]:
    """OpenCLIP bigG text tower (conditioner.embedders.1.model). The packed
    in_proj qkv is handled specially in convert()."""
    tk = "conditioner.embedders.1.model"
    fp = ("clip_bigg",)
    rules = [
        (f"{tk}.token_embedding.weight", fp + ("token_embedding", "embedding"), None),
        (f"{tk}.positional_embedding", fp + ("positional_embedding",), None),
        (f"{tk}.text_projection", fp + ("text_projection",), None),
    ]
    for i in range(layers):
        lt = f"{tk}.transformer.resblocks.{i}"
        lf = fp + (f"block_{i}",)
        rules.append((f"{lt}.attn.in_proj_weight", lf + ("attn", "__qkv_w__"), "qkv_w"))
        rules.append((f"{lt}.attn.in_proj_bias", lf + ("attn", "__qkv_b__"), "qkv_b"))
        rules += _dense(f"{lt}.attn.out_proj", lf + ("attn", "out_proj"))
        rules += _ln(f"{lt}.ln_1", lf + ("ln_1",))
        rules += _ln(f"{lt}.ln_2", lf + ("ln_2",))
        rules += _dense(f"{lt}.mlp.c_fc", lf + ("mlp_fc1",))
        rules += _dense(f"{lt}.mlp.c_proj", lf + ("mlp_fc2",))
    rules += _ln(f"{tk}.ln_final", fp + ("ln_final",))
    return rules


# --------------------------------------------------------------------------
# application


@dataclasses.dataclass
class ConversionReport:
    filled: int = 0
    missing: List[str] = dataclasses.field(default_factory=list)
    unused: List[str] = dataclasses.field(default_factory=list)

    def summary(self) -> str:
        return (
            f"filled={self.filled} missing_flax_leaves={len(self.missing)} "
            f"unused_torch_keys={len(self.unused)}"
        )


def _set_path(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def apply_rules(
    torch_sd: Dict[str, Any],
    rules: List[Rule],
    out: Dict,
    report: ConversionReport,
    used: set,
):
    for tkey, fpath, kind in rules:
        if tkey not in torch_sd:
            report.missing.append(tkey + " -> " + "/".join(fpath))
            continue
        v = _as_numpy(torch_sd[tkey])
        used.add(tkey)
        if kind == "linear":
            v = t_linear(v)
        elif kind == "conv":
            v = t_conv(v)
        elif kind == "qkv_w":
            q, k, vv = np.split(v, 3, axis=0)
            base = fpath[:-1]
            for name, w in (("q_proj", q), ("k_proj", k), ("v_proj", vv)):
                _set_path(out, base + (name, "Dense_0", "kernel"), t_linear(w))
                report.filled += 1
            continue
        elif kind == "qkv_b":
            q, k, vv = np.split(v, 3, axis=0)
            base = fpath[:-1]
            for name, b in (("q_proj", q), ("k_proj", k), ("v_proj", vv)):
                _set_path(out, base + (name, "Dense_0", "bias"), b)
                report.filled += 1
            continue
        _set_path(out, fpath, v)
        report.filled += 1


def convert_supir_state_dict(
    torch_sd: Dict[str, Any],
    cfg: SUPIRConfig,
    with_conditioner: bool = True,
) -> Tuple[Dict[str, Any], ConversionReport]:
    """Full SUPIR model conversion. torch_sd may be a layered merge
    (SDXL base updated with SUPIR Q/F) — merge dicts before calling."""
    report = ConversionReport()
    used: set = set()
    params: Dict[str, Any] = {"unet": {}, "control": {}, "vae": {}}
    apply_rules(torch_sd, light_glv_unet_rules(cfg.unet, cfg.control), params["unet"], report, used)
    apply_rules(torch_sd, glv_control_rules(cfg.unet), params["control"], report, used)
    apply_rules(torch_sd, vae_rules(cfg.vae), params["vae"], report, used)
    if with_conditioner:
        params["conditioner"] = {}
        apply_rules(torch_sd, clip_l_rules(), params["conditioner"], report, used)
        apply_rules(torch_sd, clip_bigg_rules(), params["conditioner"], report, used)
    report.unused = sorted(k for k in torch_sd if k not in used)
    return params, report


def load_torch_file(path: str) -> Dict[str, Any]:
    """Load .safetensors or torch .ckpt/.pt (reference SUPIR/util.py:15-24)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def load_supir_checkpoint(
    cfg: SUPIRConfig,
    sdxl_path: str,
    supir_path: Optional[str] = None,
    with_conditioner: bool = True,
):
    """Layered load: SDXL base then SUPIR Q/F merged over it, then convert.

    The SUPIR ckpt carries model.control_model.*, the project_modules, and
    first_stage_model.denoise_encoder.* among others; later keys win.
    """
    sd = load_torch_file(sdxl_path)
    if supir_path:
        sd.update(load_torch_file(supir_path))
    # SDXL base has no denoise_encoder: fall back to the plain encoder copy
    # (the reference deep-copies encoder at init and only overrides it when
    # the SUPIR ckpt provides weights, SUPIR_model.py:17)
    enc_prefix = "first_stage_model.encoder."
    den_prefix = "first_stage_model.denoise_encoder."
    for k in list(sd.keys()):
        if k.startswith(enc_prefix):
            dk = den_prefix + k[len(enc_prefix):]
            if dk not in sd:
                sd[dk] = sd[k]
    return convert_supir_state_dict(sd, cfg, with_conditioner=with_conditioner)
