"""Pin the facexlib face-model checkpoint key spaces as data.

The reference restores faces through facexlib's RetinaFace-R50 detector and
ParseNet parser (SUPIR/utils/face_restoration_helper.py:114-118); this image
has neither facexlib nor its checkpoints, so `utils/face_ckpt.py`'s key maps
were transcriptions. This tool makes them testable offline: it builds torch
modules whose ATTRIBUTE STRUCTURE replicates the public architectures
(biubug6/Pytorch_Retinaface for the detector, facexlib/parsing/parsenet.py
for the parser) at full width — torch derives state_dict key names
mechanically from that structure, so the resulting key space is forced, not
hand-spelled — and records {key: shape} into
supir_tpu/data/face_key_manifests.json for the manifest tests
(tests/test_face_models.py) to enforce bijective rule coverage.

Run: python tools/make_face_manifests.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch
import torch.nn as nn


# --------------------------------------------------------------- RetinaFace

def _conv_bn(inp, oup, k=3, stride=1, pad=1):
    return nn.Sequential(
        nn.Conv2d(inp, oup, k, stride, pad, bias=False), nn.BatchNorm2d(oup)
    )


class _Bottleneck(nn.Module):
    """torchvision resnet Bottleneck key layout (conv1/bn1..conv3/bn3 +
    downsample.[0|1] on the first block of each stage)."""

    def __init__(self, inp, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )


def _res_stage(inp, planes, blocks, stride):
    mods = [_Bottleneck(inp, planes, stride, downsample=True)]
    mods += [_Bottleneck(planes * 4, planes) for _ in range(blocks - 1)]
    return nn.Sequential(*mods)


class _ResNet50Trunk(nn.Module):
    """resnet50 through layer4 (IntermediateLayerGetter drops avgpool/fc;
    the detector checkpoint has exactly these keys under `body.`)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.layer1 = _res_stage(64, 64, 3, 1)
        self.layer2 = _res_stage(256, 128, 4, 2)
        self.layer3 = _res_stage(512, 256, 6, 2)
        self.layer4 = _res_stage(1024, 512, 3, 2)


class _FPN(nn.Module):
    def __init__(self, ins=(512, 1024, 2048), out=256):
        super().__init__()
        self.output1 = _conv_bn(ins[0], out, k=1, pad=0)
        self.output2 = _conv_bn(ins[1], out, k=1, pad=0)
        self.output3 = _conv_bn(ins[2], out, k=1, pad=0)
        self.merge1 = _conv_bn(out, out)
        self.merge2 = _conv_bn(out, out)


class _SSH(nn.Module):
    def __init__(self, inp=256, oup=256):
        super().__init__()
        self.conv3X3 = _conv_bn(inp, oup // 2)
        self.conv5X5_1 = _conv_bn(inp, oup // 4)
        self.conv5X5_2 = _conv_bn(oup // 4, oup // 4)
        self.conv7X7_2 = _conv_bn(oup // 4, oup // 4)
        self.conv7x7_3 = _conv_bn(oup // 4, oup // 4)  # lowercase x: upstream quirk


class _Head(nn.Module):
    def __init__(self, out_per_anchor, inp=256, anchors=2):
        super().__init__()
        self.conv1x1 = nn.Conv2d(inp, anchors * out_per_anchor, 1)


class RetinaFaceReplica(nn.Module):
    def __init__(self):
        super().__init__()
        self.body = _ResNet50Trunk()
        self.fpn = _FPN()
        self.ssh1 = _SSH()
        self.ssh2 = _SSH()
        self.ssh3 = _SSH()
        self.ClassHead = nn.ModuleList([_Head(2) for _ in range(3)])
        self.BboxHead = nn.ModuleList([_Head(4) for _ in range(3)])
        self.LandmarkHead = nn.ModuleList([_Head(10) for _ in range(3)])


# ----------------------------------------------------------------- ParseNet

class _PNorm(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm = nn.BatchNorm2d(ch)


class _PConvLayer(nn.Module):
    """facexlib ConvLayer: conv2d (+ .norm NormLayer when norm_type='bn';
    conv bias only without the norm)."""

    def __init__(self, inp, out, norm: bool):
        super().__init__()
        self.conv2d = nn.Conv2d(inp, out, 3, bias=not norm)
        if norm:
            self.norm = _PNorm(out)


class _PResBlock(nn.Module):
    def __init__(self, c_in, c_out, shortcut: bool):
        super().__init__()
        if shortcut:
            self.shortcut_func = _PConvLayer(c_in, c_out, norm=False)
        self.preact_func = nn.Sequential(_PNorm(c_in))
        self.conv1 = _PConvLayer(c_in, c_out, norm=True)
        self.conv2 = _PConvLayer(c_out, c_out, norm=False)


def _clip(c, lo=32, hi=256):
    return max(lo, min(c, hi))


class ParseNetReplica(nn.Module):
    def __init__(self, in_size=512, min_feat_size=32, base_ch=64,
                 res_depth=10, parsing_ch=19):
        super().__init__()
        import math

        down_steps = int(math.log2(in_size // min_feat_size))
        enc = [_PConvLayer(3, base_ch, norm=False)]
        ch = base_ch
        for _ in range(down_steps):
            enc.append(_PResBlock(_clip(ch), _clip(ch * 2), shortcut=True))
            ch *= 2
        self.encoder = nn.Sequential(*enc)
        self.body = nn.Sequential(
            *[_PResBlock(_clip(ch), _clip(ch), shortcut=False) for _ in range(res_depth)]
        )
        dec = []
        for _ in range(down_steps):
            dec.append(_PResBlock(_clip(ch), _clip(ch // 2), shortcut=True))
            ch //= 2
        self.decoder = nn.Sequential(*dec)
        self.out_img_conv = _PConvLayer(_clip(ch), 3, norm=False)
        self.out_mask_conv = _PConvLayer(_clip(ch), parsing_ch, norm=False)


def state_shapes(mod: nn.Module):
    return {
        k: list(v.shape)
        for k, v in mod.state_dict().items()
        if "num_batches_tracked" not in k
    }


def main():
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "supir_tpu", "data", "face_key_manifests.json",
    )
    manifests = {
        "retinaface": state_shapes(RetinaFaceReplica()),
        "parsenet": state_shapes(ParseNetReplica()),
    }
    with open(out_path, "w") as f:
        json.dump(manifests, f, indent=1, sort_keys=True)
    for name, m in manifests.items():
        print(f"{name}: {len(m)} keys")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
