"""RetinaFace-ResNet50 face detector (TPU-native).

Replaces the reference's facexlib detection backend
(`SUPIR/utils/face_restoration_helper.py:114` →
`facexlib.detection.init_detection_model('retinaface_resnet50')`, which is
the biubug6/Pytorch_Retinaface architecture) with a flax NHWC
implementation:

  - ResNet-50 trunk (C3/C4/C5 feature maps) + FPN (256ch) + three SSH
    context modules + per-level class/bbox/landmark heads (2 anchors per
    position).
  - All convs NHWC/bf16-able; batch-norms are inference-mode affine
    transforms using the checkpoint's running statistics (detection is
    never trained here).
  - The network runs as ONE jitted call on a fixed letterboxed canvas
    (static shapes; no per-image recompiles). Anchor decoding + NMS are
    data-dependent, tiny (a few thousand boxes), and run on the host in
    numpy — the TPU-idiomatic split for a once-per-image detector.

Output contract matches `detect_faces`: an [N, 15] array of
[x1, y1, x2, y2, score, lmk0x, lmk0y, ..., lmk4x, lmk4y] rows in input
image coordinates (reference helper reads landmarks at columns 5:15,
face_restoration_helper.py:216-227).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# Anchor configuration (cfg_re50 in biubug6/Pytorch_Retinaface and facexlib)
MIN_SIZES = ((16, 32), (64, 128), (256, 512))
STEPS = (8, 16, 32)
VARIANCES = (0.1, 0.2)
# preprocessing mean, BGR order (detect_faces subtracts (104, 117, 123))
BGR_MEANS = (104.0, 117.0, 123.0)


class ConvBN(nn.Module):
    """Conv + inference-mode BatchNorm (+ optional ReLU).

    BN running stats are stored as params (`mean`, `var`) so the torch
    converter can place them; they are never updated.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    use_bn: bool = True
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x)
        if self.use_bn:
            c = self.features
            scale = self.param("bn_scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bn_bias", nn.initializers.zeros, (c,), jnp.float32)
            mean = self.param("bn_mean", nn.initializers.zeros, (c,), jnp.float32)
            var = self.param("bn_var", nn.initializers.ones, (c,), jnp.float32)
            a = scale * jax.lax.rsqrt(var + 1e-5)
            x = x * a.astype(x.dtype) + (bias - mean * a).astype(x.dtype)
        if self.relu:
            x = nn.relu(x)
        return x


class Bottleneck(nn.Module):
    """torchvision-style ResNet bottleneck (1x1 -> 3x3 -> 1x1, expansion 4)."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ConvBN(self.features, 1, dtype=self.dtype, name="conv1")(x)
        out = ConvBN(self.features, 3, stride=self.stride, dtype=self.dtype, name="conv2")(out)
        out = ConvBN(self.features * 4, 1, relu=False, dtype=self.dtype, name="conv3")(out)
        if self.downsample:
            x = ConvBN(self.features * 4, 1, stride=self.stride, relu=False,
                       dtype=self.dtype, name="downsample")(x)
        return nn.relu(out + x)


class ResNet50Trunk(nn.Module):
    """ResNet-50 through layer4; returns (C3, C4, C5) = layer2/3/4 outputs
    (the IntermediateLayerGetter return_layers of cfg_re50)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        c = 64
        scale = self.param("stem_bn_scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("stem_bn_bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("stem_bn_mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("stem_bn_var", nn.initializers.ones, (c,), jnp.float32)
        a = scale * jax.lax.rsqrt(var + 1e-5)
        x = nn.relu(x * a.astype(x.dtype) + (bias - mean * a).astype(x.dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        for li, (blocks, feats, stride) in enumerate(
            [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]
        ):
            for bi in range(blocks):
                x = Bottleneck(
                    feats,
                    stride=stride if bi == 0 else 1,
                    downsample=bi == 0,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x)
            if li >= 1:
                outs.append(x)
        return tuple(outs)  # C3 (1/8), C4 (1/16), C5 (1/32)


class SSH(nn.Module):
    """SSH context module: 3x3, 5x5 (two stacked 3x3), 7x7 (three stacked)
    branches concatenated then ReLU (Pytorch_Retinaface net.py SSH)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f2 = self.features // 2
        f4 = self.features // 4
        b3 = ConvBN(f2, 3, relu=False, dtype=self.dtype, name="conv3x3")(x)
        c5_1 = ConvBN(f4, 3, dtype=self.dtype, name="conv5x5_1")(x)
        b5 = ConvBN(f4, 3, relu=False, dtype=self.dtype, name="conv5x5_2")(c5_1)
        c7_1 = ConvBN(f4, 3, dtype=self.dtype, name="conv7x7_2")(c5_1)
        b7 = ConvBN(f4, 3, relu=False, dtype=self.dtype, name="conv7x7_3")(c7_1)
        return nn.relu(jnp.concatenate([b3, b5, b7], axis=-1))


class RetinaFace(nn.Module):
    """Full detector; input NHWC float (BGR means already subtracted).

    Returns (loc [B, A, 4], conf [B, A, 2], landms [B, A, 10]) where A is
    the total anchor count over the three strides.
    """

    fpn_features: int = 256
    num_anchors: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c3, c4, c5 = ResNet50Trunk(dtype=self.dtype, name="body")(x)

        f = self.fpn_features
        p3 = ConvBN(f, 1, dtype=self.dtype, name="fpn_output1")(c3)
        p4 = ConvBN(f, 1, dtype=self.dtype, name="fpn_output2")(c4)
        p5 = ConvBN(f, 1, dtype=self.dtype, name="fpn_output3")(c5)
        # top-down: nearest-neighbor upsample + add + 3x3 merge
        up4 = jax.image.resize(p5, p4.shape, "nearest")
        p4 = ConvBN(f, 3, dtype=self.dtype, name="fpn_merge2")(p4 + up4)
        up3 = jax.image.resize(p4, p3.shape, "nearest")
        p3 = ConvBN(f, 3, dtype=self.dtype, name="fpn_merge1")(p3 + up3)

        feats = [
            SSH(f, dtype=self.dtype, name=f"ssh{i + 1}")(p)
            for i, p in enumerate((p3, p4, p5))
        ]

        locs, confs, landms = [], [], []
        for i, feat in enumerate(feats):
            b = feat.shape[0]
            loc = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                          name=f"bbox_head{i}")(feat)
            conf = nn.Conv(self.num_anchors * 2, (1, 1), dtype=self.dtype,
                           name=f"class_head{i}")(feat)
            ldm = nn.Conv(self.num_anchors * 10, (1, 1), dtype=self.dtype,
                          name=f"landmark_head{i}")(feat)
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, 2))
            landms.append(ldm.reshape(b, -1, 10))
        loc = jnp.concatenate(locs, axis=1)
        conf = jnp.concatenate(confs, axis=1)
        ldm = jnp.concatenate(landms, axis=1)
        return loc.astype(jnp.float32), jax.nn.softmax(conf.astype(jnp.float32), axis=-1), ldm.astype(jnp.float32)


# ------------------------------------------------------------------ priors


def prior_boxes(image_size: tuple[int, int]) -> np.ndarray:
    """Anchor centers/sizes [A, 4] (cx, cy, w, h), normalized to [0, 1]
    (Pytorch_Retinaface prior_box.py semantics, clip=False)."""
    h, w = image_size
    anchors = []
    for k, step in enumerate(STEPS):
        fh = -(-h // step)  # ceil
        fw = -(-w // step)
        for i in range(fh):
            for j in range(fw):
                for ms in MIN_SIZES[k]:
                    s_kx = ms / w
                    s_ky = ms / h
                    cx = (j + 0.5) * step / w
                    cy = (i + 0.5) * step / h
                    anchors.append([cx, cy, s_kx, s_ky])
    return np.asarray(anchors, np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """SSD-style box decode (box_utils.decode)."""
    v0, v1 = VARIANCES
    xy = priors[:, :2] + loc[:, :2] * v0 * priors[:, 2:]
    wh = priors[:, 2:] * np.exp(loc[:, 2:] * v1)
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=1)
    return boxes


def decode_landmarks(ldm: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """[A, 10] landmark decode (box_utils.decode_landm)."""
    v0 = VARIANCES[0]
    pts = []
    for i in range(5):
        pts.append(priors[:, :2] + ldm[:, 2 * i:2 * i + 2] * v0 * priors[:, 2:])
    return np.concatenate(pts, axis=1)


def nms(dets: np.ndarray, thresh: float) -> list[int]:
    """Plain IoU NMS over [N, 5] (x1,y1,x2,y2,score) host-side."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return keep


class RetinaFaceDetector:
    """detect_faces-compatible wrapper around the flax model.

    Runs the network on a fixed square canvas (default 640, the resize the
    reference face demo uses — gradio_demo_face.py:103) so there is exactly
    one compiled program regardless of input size.
    """

    def __init__(self, params, canvas: int = 640, dtype=jnp.float32):
        self.model = RetinaFace(dtype=dtype)
        self.params = params
        self.canvas = canvas
        self.priors = prior_boxes((canvas, canvas))
        self._forward = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x)
        )

    @classmethod
    def create(cls, rng=None, canvas: int = 640, dtype=jnp.float32):
        """Random-weight detector (tests / smoke). Use
        `supir_tpu.utils.ckpt.load_retinaface` for real facexlib weights."""
        rng = jax.random.PRNGKey(0) if rng is None else rng
        model = RetinaFace(dtype=dtype)
        params = model.init(rng, jnp.zeros((1, canvas, canvas, 3), jnp.float32))["params"]
        return cls(params, canvas=canvas, dtype=dtype)

    def detect_faces(self, image: np.ndarray, conf_threshold: float = 0.8,
                     nms_threshold: float = 0.4) -> np.ndarray:
        """image: HWC uint8/float BGR (the reference helper's convention).
        Returns [N, 15] (bbox, score, 5 landmarks) in image coordinates."""
        img = np.asarray(image, np.float32)
        h, w = img.shape[:2]
        scale = self.canvas / max(h, w)
        nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
        # host-side resize via jax.image on CPU arrays is fine here (tiny)
        resized = np.asarray(
            jax.image.resize(jnp.asarray(img), (nh, nw, 3), "linear")
        )
        canvas = np.zeros((self.canvas, self.canvas, 3), np.float32)
        canvas[:nh, :nw] = resized
        canvas -= np.asarray(BGR_MEANS, np.float32)

        loc, conf, ldm = jax.device_get(
            self._forward(self.params, canvas[None])
        )
        boxes = decode_boxes(loc[0], self.priors) * self.canvas / scale
        landms = decode_landmarks(ldm[0], self.priors) * self.canvas / scale
        scores = conf[0, :, 1]

        keep = scores > conf_threshold
        boxes, landms, scores = boxes[keep], landms[keep], scores[keep]
        if boxes.shape[0] == 0:
            return np.zeros((0, 15), np.float32)
        order = scores.argsort()[::-1][:5000]
        boxes, landms, scores = boxes[order], landms[order], scores[order]
        dets = np.concatenate([boxes, scores[:, None]], axis=1).astype(np.float32)
        keep_idx = nms(dets, nms_threshold)
        dets = dets[keep_idx][:750]
        landms = landms[keep_idx][:750]
        return np.concatenate([dets, landms], axis=1)
