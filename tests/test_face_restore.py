"""Face alignment math: Umeyama exactness, warp roundtrip, paste-back."""

import numpy as np

from supir_tpu.utils.face_restore import (
    FACE_TEMPLATE_512,
    FaceRestoreHelper,
    center_face_landmarks,
    invert_affine,
    umeyama_similarity,
    warp_affine,
)


def test_umeyama_recovers_known_transform(rng):
    src = rng.standard_normal((5, 2)).astype(np.float32) * 50 + 100
    theta = 0.3
    s = 1.7
    r = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    t = np.array([12.0, -7.0])
    dst = (s * (src @ r.T)) + t
    m = umeyama_similarity(src, dst)
    mapped = src @ m[:2, :2].T + m[:, 2]
    np.testing.assert_allclose(mapped, dst, atol=1e-3)


def test_invert_affine():
    m = umeyama_similarity(
        np.array([[0, 0], [1, 0], [0, 1], [1, 1], [0.5, 0.5]], np.float32),
        np.array([[10, 10], [12, 10], [10, 12], [12, 12], [11, 11]], np.float32),
    )
    inv = invert_affine(m)
    p = np.array([0.3, 0.7])
    q = m[:2, :2] @ p + m[:, 2]
    back = inv[:2, :2] @ q + inv[:, 2]
    np.testing.assert_allclose(back, p, atol=1e-4)


def test_warp_identity():
    img = np.arange(16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
    ident = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    out = warp_affine(img, ident, (16, 16))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_align_and_paste_roundtrip(rng):
    helper = FaceRestoreHelper(face_size=64)
    # smooth gradient: survives the two bilinear resamples of crop+paste
    yy, xx = np.meshgrid(np.linspace(0, 1, 96), np.linspace(0, 1, 96), indexing="ij")
    img = np.stack([yy, xx, yy * xx], axis=-1).astype(np.float32)
    faces = helper.align_warp_faces(img)
    assert len(faces) == 1
    assert faces[0].crop.shape == (64, 64, 3)
    # pasting the unmodified crop back ~= original in the face region
    out = helper.paste_faces_to_input_image(img, faces, [faces[0].crop])
    assert out.shape == img.shape
    center_err = np.abs(out[40:56, 40:56] - img[40:56, 40:56]).mean()
    assert center_err < 0.08, center_err


def test_center_landmarks_shape():
    lm = center_face_landmarks(np.zeros((100, 80, 3)))
    assert lm.shape == (1, 5, 2)
    assert (lm[:, :, 0] < 80).all() and (lm[:, :, 1] < 100).all()
