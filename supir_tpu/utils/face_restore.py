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


# ---------------------------------------------------------------------------
# detector-driven landmark extraction + parse-mask paste-back
# (reference get_face_landmarks_5 / paste_faces_to_input_image,
#  face_restoration_helper.py:186-470)


def get_largest_face(det_faces: np.ndarray, h: int, w: int) -> int:
    def area(bb):
        left, top = max(bb[0], 0), max(bb[1], 0)
        right, bottom = min(bb[2], w), min(bb[3], h)
        return (right - left) * (bottom - top)

    return int(np.argmax([area(b) for b in det_faces]))


def get_center_face(det_faces: np.ndarray, h: int, w: int) -> int:
    center = np.array([w / 2, h / 2])
    dists = [
        np.linalg.norm(np.array([(b[0] + b[2]) / 2, (b[1] + b[3]) / 2]) - center)
        for b in det_faces
    ]
    return int(np.argmin(dists))


def landmarks_from_detections(
    bboxes: np.ndarray,
    image_hw: Tuple[int, int],
    only_keep_largest: bool = False,
    only_center_face: bool = False,
    eye_dist_threshold: Optional[float] = None,
) -> np.ndarray:
    """[N, 15] detect_faces rows -> [M, 5, 2] landmark sets, applying the
    reference's eye-distance filter and largest/center selection."""
    landmarks, det = [], []
    for bb in np.asarray(bboxes, np.float32):
        eye_dist = np.linalg.norm([bb[6] - bb[8], bb[7] - bb[9]])
        if eye_dist_threshold is not None and eye_dist < eye_dist_threshold:
            continue
        landmarks.append(bb[5:15].reshape(5, 2))
        det.append(bb[0:5])
    if not landmarks:
        return np.zeros((0, 5, 2), np.float32)
    h, w = image_hw
    if only_keep_largest:
        i = get_largest_face(np.stack(det), h, w)
        return np.stack(landmarks[i:i + 1])
    if only_center_face:
        i = get_center_face(np.stack(det), h, w)
        return np.stack(landmarks[i:i + 1])
    return np.stack(landmarks)


def detector_from_models(retinaface, resize: int = 640,
                         eye_dist_threshold: Optional[float] = 5.0,
                         only_center_face: bool = False,
                         only_keep_largest: bool = False):
    """Wrap a RetinaFaceDetector into the helper's landmark-callable
    interface (the reference demo's settings: resize=640,
    eye_dist_threshold=5 — gradio_demo_face.py:103). The detector already
    letterboxes internally, so `resize` is carried by its canvas size."""

    def detect(img: np.ndarray) -> np.ndarray:
        bgr = np.asarray(img, np.float32)
        if bgr.max() <= 1.5:  # [0,1] float input
            bgr = bgr * 255.0
        bboxes = retinaface.detect_faces(bgr[..., ::-1])  # RGB -> BGR
        return landmarks_from_detections(
            bboxes, bgr.shape[:2],
            only_keep_largest=only_keep_largest,
            only_center_face=only_center_face,
            eye_dist_threshold=eye_dist_threshold,
        )

    return detect


def soft_erosion_mask(face_size: int, upscale_factor: int = 1) -> np.ndarray:
    """The reference's square fusion mask: all-ones warped mask, eroded by
    2*upscale, then eroded+blurred by an area-scaled edge width
    (face_restoration_helper.py:421-445). Computed here directly in crop
    space (erosion of an all-ones rect == zeroing a border)."""
    mask = np.ones((face_size, face_size), np.float32)
    e1 = int(2 * upscale_factor)
    mask[:e1], mask[-e1:], mask[:, :e1], mask[:, -e1:] = 0, 0, 0, 0
    total_face_area = (face_size - 2 * e1) ** 2
    w_edge = int(total_face_area**0.5) // 20
    er = w_edge * 2
    if er > 0:
        center = np.zeros_like(mask)
        center[er:-er, er:-er] = mask[er:-er, er:-er]
    else:
        center = mask
    blur = w_edge * 2 + 1
    if blur > 1:
        import jax.numpy as jnp

        from supir_tpu.ops.resize import gaussian_blur

        center = np.asarray(
            gaussian_blur(jnp.asarray(center)[None, ..., None], ksize=blur,
                          sigma=0.3 * ((blur - 1) * 0.5 - 1) + 0.8)
        )[0, ..., 0]
    return center


class ParsedPasteBack:
    """paste_faces_to_input_image with the ParseNet soft mask
    (reference use_parse branch, face_restoration_helper.py:446-470)."""

    def __init__(self, helper: "FaceRestoreHelper", parser=None,
                 upscale_factor: int = 1):
        self.helper = helper
        self.parser = parser
        self.upscale = upscale_factor

    def __call__(self, img: np.ndarray, faces: List[AlignedFace],
                 restored: List[np.ndarray]) -> np.ndarray:
        out = img.astype(np.float32).copy()
        s = self.helper.face_size
        soft = soft_erosion_mask(s, self.upscale)
        for face, rest in zip(faces, restored):
            inv = invert_affine(face.affine)
            back = warp_affine(rest, inv, img.shape[:2])
            inv_soft = np.clip(
                warp_affine(soft[:, :, None], inv, img.shape[:2])[:, :, 0], 0, 1
            )
            if self.parser is not None:
                face512 = rest
                if rest.shape[0] != 512:
                    import jax.numpy as jnp

                    from supir_tpu.ops.resize import bilinear_resize

                    face512 = np.asarray(
                        bilinear_resize(jnp.asarray(rest, jnp.float32)[None],
                                        (512, 512))
                    )[0]
                scale01 = face512.max() <= 1.5
                bgr = (face512[..., ::-1] * 255.0) if scale01 else face512[..., ::-1]
                pm = self.parser.parse_mask(bgr)
                if pm.shape[0] != s:
                    import jax.numpy as jnp

                    from supir_tpu.ops.resize import bilinear_resize

                    pm = np.asarray(
                        bilinear_resize(jnp.asarray(pm, jnp.float32)[None, ..., None],
                                        (s, s))
                    )[0, ..., 0]
                inv_parse = np.clip(
                    warp_affine(pm[:, :, None], inv, img.shape[:2])[:, :, 0], 0, 1
                )
                # fuse: take the parse mask where it is tighter
                fuse = (inv_parse < inv_soft).astype(np.float32)
                inv_soft = inv_parse * fuse + inv_soft * (1 - fuse)
            m = inv_soft[:, :, None]
            out = out * (1 - m) + back * m
        return out
