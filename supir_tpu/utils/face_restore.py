"""Face restoration helper.

Behavioral contract: `SUPIR/utils/face_restoration_helper.py:49-513`
(FaceRestoreHelper): detect 5 facial landmarks, similarity-align each face
to the 512x512 FFHQ template, restore the crop, and paste back with the
inverse affine + a soft mask.

The reference depends on facexlib's CUDA RetinaFace/ParseNet models. Those
weights are external there too, so detection is a *pluggable interface*
here: pass any `detector(img_uint8) -> [N, 5, 2] landmarks` (a converted
RetinaFace, an external service, or manual landmarks). A geometric
fallback (`center_face_landmarks`) keeps the pipeline runnable end-to-end
without detector weights. Alignment math is the closed-form Umeyama
similarity transform; warps run on-device via jax.scipy affine sampling.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import numpy as np

# FFHQ-style 5-landmark template for a 512x512 face crop
# (eyes, nose tip, mouth corners — the standard alignment target).
FACE_TEMPLATE_512 = np.array(
    [
        [192.98138, 239.94708],
        [318.90277, 240.19366],
        [256.63416, 314.01935],
        [201.26117, 371.41043],
        [313.08905, 371.15118],
    ],
    np.float32,
)


def umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Closed-form similarity transform (scale+rot+trans) mapping src->dst.

    Returns a 2x3 affine matrix. Standard Umeyama (1991) estimator."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u) * np.linalg.det(vt))
    diag = np.diag([1.0, d])
    r = u @ diag @ vt
    var_s = (sc**2).sum() / len(src)
    scale = np.trace(np.diag(s) @ diag) / var_s
    t = mu_d - scale * r @ mu_s
    m = np.zeros((2, 3))
    m[:2, :2] = scale * r
    m[:, 2] = t
    return m.astype(np.float32)


def invert_affine(m: np.ndarray) -> np.ndarray:
    a = np.eye(3, dtype=np.float64)
    a[:2] = m
    inv = np.linalg.inv(a)
    return inv[:2].astype(np.float32)


def warp_affine(img: np.ndarray, m: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Warp img (H,W,C float) by 2x3 matrix m (src->dst coords)."""
    import jax
    import jax.numpy as jnp
    from jax.scipy.ndimage import map_coordinates

    minv = invert_affine(m)
    oh, ow = out_hw
    ys, xs = jnp.meshgrid(jnp.arange(oh), jnp.arange(ow), indexing="ij")
    src_x = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
    src_y = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
    out = []
    imgj = jnp.asarray(img, jnp.float32)
    for c in range(img.shape[2]):
        out.append(map_coordinates(imgj[:, :, c], [src_y, src_x], order=1, mode="nearest"))
    return np.asarray(jnp.stack(out, axis=-1))


def center_face_landmarks(img: np.ndarray) -> np.ndarray:
    """Fallback 'detector': one face assumed centered, spanning ~60% of the
    shorter side. Returns [1, 5, 2]."""
    h, w = img.shape[:2]
    side = min(h, w) * 0.6
    cx, cy = w / 2, h / 2
    scale = side / 512.0
    lm = (FACE_TEMPLATE_512 - 256.0) * scale + np.array([cx, cy], np.float32)
    return lm[None]


@dataclasses.dataclass
class AlignedFace:
    crop: np.ndarray          # [S, S, C] aligned face crop
    affine: np.ndarray        # 2x3 input->crop matrix


class FaceRestoreHelper:
    """Crop/align faces, restore, paste back (reference FaceRestoreHelper)."""

    def __init__(
        self,
        face_size: int = 512,
        detector: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ):
        self.face_size = face_size
        self.detector = detector or center_face_landmarks
        self.template = FACE_TEMPLATE_512 * (face_size / 512.0)

    def get_face_landmarks_5(self, img: np.ndarray) -> np.ndarray:
        return np.asarray(self.detector(img), np.float32)

    def align_warp_faces(self, img: np.ndarray) -> List[AlignedFace]:
        faces = []
        for lm in self.get_face_landmarks_5(img):
            m = umeyama_similarity(lm, self.template)
            crop = warp_affine(img, m, (self.face_size, self.face_size))
            faces.append(AlignedFace(crop=crop, affine=m))
        return faces

    def paste_faces_to_input_image(
        self, img: np.ndarray, faces: List[AlignedFace], restored: List[np.ndarray]
    ) -> np.ndarray:
        """Inverse-affine paste-back with a soft border mask."""
        out = img.astype(np.float32).copy()
        s = self.face_size
        border = max(s // 20, 4)
        mask = np.ones((s, s), np.float32)
        ramp = np.linspace(0, 1, border, dtype=np.float32)
        mask[:border] *= ramp[:, None]
        mask[-border:] *= ramp[::-1][:, None]
        mask[:, :border] *= ramp[None]
        mask[:, -border:] *= ramp[::-1][None]
        for face, rest in zip(faces, restored):
            inv = invert_affine(face.affine)
            back = warp_affine(rest, inv, img.shape[:2])
            m_back = warp_affine(mask[:, :, None], inv, img.shape[:2])[:, :, 0]
            m_back = np.clip(m_back, 0.0, 1.0)[:, :, None]
            out = out * (1 - m_back) + back * m_back
        return out
