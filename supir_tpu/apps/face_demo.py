"""Face-restoration pipeline — the reference gradio_demo_face.py flow
(:180-214): align/crop each detected face, restore it at face_resolution,
optionally restore the background, paste faces back via the inverse
affine.

Detector is pluggable (see supir_tpu/utils/face_restore.py); without
detector weights the center-face fallback handles portrait-style inputs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def restore_with_faces(
    engine,
    cfg,
    image: np.ndarray,  # [H, W, 3] float32 in [-1, 1]
    prompt: str = "",
    face_resolution: int = 1024,
    num_steps: int = 50,
    cfg_scale: float = 7.5,
    seed: int = 0,
    restore_background: bool = True,
    detector=None,
    parser=None,
) -> np.ndarray:
    """`detector`: a landmark callable, a RetinaFaceDetector (wrapped via
    detector_from_models, the reference demo's settings), or None for the
    geometric center-face fallback. `parser`: an optional FaceParser for
    parse-mask paste-back (reference use_parse branch)."""
    import jax.numpy as jnp

    from supir_tpu.utils.face_restore import (
        FaceRestoreHelper,
        ParsedPasteBack,
        detector_from_models,
    )
    from supir_tpu.utils.tokenizer import tokenize

    if detector is not None and hasattr(detector, "detect_faces"):
        detector = detector_from_models(detector)
    helper = FaceRestoreHelper(face_size=face_resolution, detector=detector)
    img01 = (image + 1.0) / 2.0
    faces = helper.align_warp_faces(img01)

    def run(x_arr, steps):
        x = jnp.asarray(x_arr, jnp.float32)[None]
        z = engine.encode_first_stage_with_denoise(x)
        tok_p = jnp.asarray(tokenize([prompt + cfg.p_p]))
        tok_n = jnp.asarray(tokenize([cfg.n_p]))
        c, uc = engine.prepare_condition(z, tok_p, tok_p, tok_n, tok_n)
        out = engine.batchify_sample(
            x, c, uc, num_steps=steps, cfg_scale=cfg_scale, seed=seed,
            color_fix_type="Wavelet", z_override=z,
        )
        return np.asarray(out[0])

    restored_faces = []
    for f in faces:
        face_in = f.crop * 2.0 - 1.0
        out = run(face_in, num_steps)
        restored_faces.append((out + 1.0) / 2.0)

    if restore_background:
        bg = run(image, num_steps)
        base = (bg + 1.0) / 2.0
    else:
        base = img01

    if parser is not None:
        paste = ParsedPasteBack(helper, parser=parser)
        merged = paste(base, faces, restored_faces)
    else:
        merged = helper.paste_faces_to_input_image(base, faces, restored_faces)
    return np.clip(merged * 2.0 - 1.0, -1.0, 1.0)
