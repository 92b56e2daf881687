"""facexlib checkpoint converters (RetinaFace-R50 detector, ParseNet parser).

Maps the torch state dicts the reference downloads via facexlib
(`detection_Resnet50_Final.pth`, `parsing_parsenet.pth`;
face_restoration_helper.py:114-118) onto the flax trees of
`supir_tpu.models.retinaface.RetinaFace` / `supir_tpu.models.parsenet.ParseNet`.

Key layout follows the public biubug6/Pytorch_Retinaface and
facexlib/parsing/parsenet.py module structures. The image this framework is
developed in has neither facexlib nor its checkpoints, so the torch key
spellings here are a best-effort transcription of those public sources —
`apply_rules`'s ConversionReport lists every unmatched key loudly at load
time; a non-empty `missing` list means a key-name drift, not a silent
mis-load.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

from supir_tpu.utils.ckpt import (
    ConversionReport,
    Rule,
    apply_rules,
    load_torch_file,
)


# ----------------------------------------------------------- rule builders

def _convbn(tk_conv: str, tk_bn: str, fp: Tuple[str, ...], bias=False) -> List[Rule]:
    rules = [(f"{tk_conv}.weight", fp + ("conv", "kernel"), "conv")]
    if bias:
        rules.append((f"{tk_conv}.bias", fp + ("conv", "bias"), None))
    rules += [
        (f"{tk_bn}.weight", fp + ("bn_scale",), None),
        (f"{tk_bn}.bias", fp + ("bn_bias",), None),
        (f"{tk_bn}.running_mean", fp + ("bn_mean",), None),
        (f"{tk_bn}.running_var", fp + ("bn_var",), None),
    ]
    return rules


def retinaface_rules() -> List[Rule]:
    rules: List[Rule] = []
    # ResNet-50 trunk (torchvision layout under `body.`)
    rules.append(("body.conv1.weight", ("body", "stem_conv", "kernel"), "conv"))
    for part, leaf in (("weight", "stem_bn_scale"), ("bias", "stem_bn_bias"),
                       ("running_mean", "stem_bn_mean"), ("running_var", "stem_bn_var")):
        rules.append((f"body.bn1.{part}", ("body", leaf), None))
    for l, blocks in enumerate([3, 4, 6, 3], start=1):
        for b in range(blocks):
            base = f"body.layer{l}.{b}"
            fp = ("body", f"layer{l}_{b}")
            for k in (1, 2, 3):
                rules += _convbn(f"{base}.conv{k}", f"{base}.bn{k}", fp + (f"conv{k}",))
            if b == 0:
                rules += _convbn(f"{base}.downsample.0", f"{base}.downsample.1",
                                 fp + ("downsample",))
    # FPN lateral + merge convs (Sequential [conv, bn] via conv_bn1X1/conv_bn)
    for i in (1, 2, 3):
        rules += _convbn(f"fpn.output{i}.0", f"fpn.output{i}.1", (f"fpn_output{i}",))
    for i in (1, 2):
        rules += _convbn(f"fpn.merge{i}.0", f"fpn.merge{i}.1", (f"fpn_merge{i}",))
    # SSH context modules (note the reference's mixed-case conv7x7_3)
    for i in (1, 2, 3):
        m = f"ssh{i}"
        for tk, fk in (
            ("conv3X3", "conv3x3"),
            ("conv5X5_1", "conv5x5_1"),
            ("conv5X5_2", "conv5x5_2"),
            ("conv7X7_2", "conv7x7_2"),
            ("conv7x7_3", "conv7x7_3"),
        ):
            rules += _convbn(f"{m}.{tk}.0", f"{m}.{tk}.1", (m, fk))
    # detection heads (plain 1x1 convs with bias)
    for i in range(3):
        for tk, fk in (("ClassHead", "class_head"), ("BboxHead", "bbox_head"),
                       ("LandmarkHead", "landmark_head")):
            rules.append((f"{tk}.{i}.conv1x1.weight", (f"{fk}{i}", "kernel"), "conv"))
            rules.append((f"{tk}.{i}.conv1x1.bias", (f"{fk}{i}", "bias"), None))
    return rules


def _pconv(tk: str, fp: Tuple[str, ...], norm: bool) -> List[Rule]:
    """facexlib ConvLayer: .conv2d (+ .norm.norm BatchNorm when norm_type=bn;
    conv bias disabled under bn)."""
    rules = [(f"{tk}.conv2d.weight", fp + ("conv", "kernel"), "conv")]
    if norm:
        rules += [
            (f"{tk}.norm.norm.weight", fp + ("bn_scale",), None),
            (f"{tk}.norm.norm.bias", fp + ("bn_bias",), None),
            (f"{tk}.norm.norm.running_mean", fp + ("bn_mean",), None),
            (f"{tk}.norm.norm.running_var", fp + ("bn_var",), None),
        ]
    else:
        rules.append((f"{tk}.conv2d.bias", fp + ("conv", "bias"), None))
    return rules


def _presblock(tk: str, fp: Tuple[str, ...], shortcut: bool) -> List[Rule]:
    rules: List[Rule] = []
    if shortcut:
        rules += _pconv(f"{tk}.shortcut_func", fp + ("shortcut",), norm=False)
    for part, leaf in (("weight", "preact_bn_scale"), ("bias", "preact_bn_bias"),
                       ("running_mean", "preact_bn_mean"),
                       ("running_var", "preact_bn_var")):
        rules.append((f"{tk}.preact_func.0.norm.{part}", fp + (leaf,), None))
    rules += _pconv(f"{tk}.conv1", fp + ("conv1",), norm=True)
    rules += _pconv(f"{tk}.conv2", fp + ("conv2",), norm=False)
    return rules


def parsenet_rules(in_size: int = 512, min_feat_size: int = 32,
                   base_ch: int = 64, res_depth: int = 10) -> List[Rule]:
    import math

    down_steps = int(math.log2(in_size // min_feat_size))
    rules: List[Rule] = []
    rules += _pconv("encoder.0", ("enc_in",), norm=False)
    ch = base_ch
    clip = lambda c: max(32, min(c, 256))
    for i in range(down_steps):
        shortcut = True  # scale change always re-projects
        rules += _presblock(f"encoder.{i + 1}", (f"enc_{i}",), shortcut)
        ch *= 2
    for i in range(res_depth):
        rules += _presblock(f"body.{i}", (f"body_{i}",), shortcut=False)
    for i in range(down_steps):
        rules += _presblock(f"decoder.{i}", (f"dec_{i}",), shortcut=True)
        ch //= 2
    rules += _pconv("out_img_conv", ("out_img",), norm=False)
    rules += _pconv("out_mask_conv", ("out_mask",), norm=False)
    return rules


# ----------------------------------------------------------------- loaders

def convert_retinaface_state_dict(torch_sd: Dict[str, Any]):
    out: Dict = {}
    report = ConversionReport()
    used: set = set()
    # facexlib saves with a `module.` DataParallel prefix stripped already;
    # strip defensively anyway
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in torch_sd.items()}
    apply_rules(sd, retinaface_rules(), out, report, used)
    report.unused = sorted(set(sd) - used - {k for k in sd if "num_batches_tracked" in k})
    return out, report


def convert_parsenet_state_dict(torch_sd: Dict[str, Any]):
    out: Dict = {}
    report = ConversionReport()
    used: set = set()
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in torch_sd.items()}
    apply_rules(sd, parsenet_rules(), out, report, used)
    report.unused = sorted(set(sd) - used - {k for k in sd if "num_batches_tracked" in k})
    return out, report


def load_retinaface(path: str, canvas: int = 640):
    """Path to facexlib detection_Resnet50_Final.pth -> RetinaFaceDetector."""
    from supir_tpu.models.retinaface import RetinaFaceDetector

    params, report = convert_retinaface_state_dict(load_torch_file(path))
    if report.missing:
        raise ValueError(
            f"retinaface conversion missing {len(report.missing)} keys, e.g. "
            + "; ".join(report.missing[:5])
        )
    return RetinaFaceDetector(params, canvas=canvas)


def load_parsenet(path: str):
    """Path to facexlib parsing_parsenet.pth -> FaceParser."""
    from supir_tpu.models.parsenet import FaceParser

    params, report = convert_parsenet_state_dict(load_torch_file(path))
    if report.missing:
        raise ValueError(
            f"parsenet conversion missing {len(report.missing)} keys, e.g. "
            + "; ".join(report.missing[:5])
        )
    return FaceParser(params)
