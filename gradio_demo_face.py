#!/usr/bin/env python
"""Face-restoration demo entry (reference gradio_demo_face.py surface):
batch CLI over a folder using the align/restore/paste-back pipeline."""

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser("face restoration")
    ap.add_argument("--img_dir", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--opt", default="options/SUPIR_v0.yaml")
    ap.add_argument("--face_resolution", type=int, default=1024)
    ap.add_argument("--edm_steps", type=int, default=50)
    ap.add_argument("--s_cfg", type=float, default=7.5)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--no_background_restore", action="store_true")
    ap.add_argument("--random_weights", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--no_llava", action="store_true")
    ap.add_argument("--retinaface_ckpt", default=None,
                    help="facexlib detection_Resnet50_Final.pth (else: "
                         "center-face geometric fallback)")
    ap.add_argument("--parsenet_ckpt", default=None,
                    help="facexlib parsing_parsenet.pth for parse-mask "
                         "paste-back")
    args, _ = ap.parse_known_args(argv)

    from PIL import Image

    from supir_tpu.apps.cli import create_engine_from_args
    from supir_tpu.apps.face_demo import restore_with_faces
    from supir_tpu.utils.image import array_to_pil, pil_to_array

    class _A:  # adapt arg names for create_engine_from_args
        tiny = args.tiny
        opt = args.opt
        SUPIR_sign = "Q"
        random_weights = args.random_weights

    engine, cfg = create_engine_from_args(_A)
    detector = parser = None
    if args.retinaface_ckpt:
        from supir_tpu.utils.face_ckpt import load_retinaface

        detector = load_retinaface(args.retinaface_ckpt)
    if args.parsenet_ckpt:
        from supir_tpu.utils.face_ckpt import load_parsenet

        parser = load_parsenet(args.parsenet_ckpt)
    os.makedirs(args.save_dir, exist_ok=True)
    for name in sorted(os.listdir(args.img_dir)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        img = Image.open(os.path.join(args.img_dir, name)).convert("RGB")
        arr, h0, w0 = pil_to_array(img, min_size=args.face_resolution)
        out = restore_with_faces(
            engine, cfg, arr, face_resolution=min(args.face_resolution, arr.shape[0]),
            num_steps=args.edm_steps, cfg_scale=args.s_cfg, seed=args.seed,
            restore_background=not args.no_background_restore,
            detector=detector, parser=parser,
        )
        array_to_pil(out, h0, w0).save(
            os.path.join(args.save_dir, os.path.splitext(name)[0] + "_face.png")
        )
        print(name, "done")


if __name__ == "__main__":
    main()
