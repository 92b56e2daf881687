"""Eval harness: PSNR / SSIM / LPIPS over a folder of (restored, reference)
image pairs — the RealPhoto60 parity check of BASELINE.md.

Usage:
  python -m supir_tpu.apps.eval --pred_dir out/ --ref_dir refs/ [--lpips W.pkl]
Prints one JSON line with per-metric means.
"""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from supir_tpu.utils.metrics import lpips, lpips_available, load_lpips_params, psnr, ssim


def _load(path, size=None):
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize(size, Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 127.5 - 1.0
    return arr


def evaluate_dirs(pred_dir: str, ref_dir: str, lpips_weights: str | None = None):
    if lpips_weights:
        load_lpips_params(lpips_weights)
    names = sorted(
        f for f in os.listdir(ref_dir) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    scores = {"psnr": [], "ssim": [], "lpips": []}
    matched = 0
    for name in names:
        base = os.path.splitext(name)[0]
        cands = [
            os.path.join(pred_dir, c)
            for c in os.listdir(pred_dir)
            if c.startswith(base)
        ]
        if not cands:
            continue
        matched += 1
        ref = _load(os.path.join(ref_dir, name))
        pred = _load(cands[0], size=(ref.shape[1], ref.shape[0]))
        a = jnp.asarray(pred)[None]
        b = jnp.asarray(ref)[None]
        scores["psnr"].append(float(psnr(a, b)[0]))
        scores["ssim"].append(float(ssim(a, b)[0]))
        if lpips_available():
            scores["lpips"].append(float(lpips(a, b)[0]))
    out = {
        "n": matched,
        "psnr": float(np.mean(scores["psnr"])) if scores["psnr"] else None,
        "ssim": float(np.mean(scores["ssim"])) if scores["ssim"] else None,
        "lpips": float(np.mean(scores["lpips"])) if scores["lpips"] else None,
    }
    return out


def main(argv=None):
    from supir_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred_dir", required=True)
    ap.add_argument("--ref_dir", required=True)
    ap.add_argument("--lpips", default=None)
    args = ap.parse_args(argv)
    print(json.dumps(evaluate_dirs(args.pred_dir, args.ref_dir, args.lpips)))


if __name__ == "__main__":
    main()
