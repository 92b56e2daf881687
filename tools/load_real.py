"""Real-weight readiness drill: the single command to run the day real
checkpoints mount (this image ships none — no SDXL/SUPIR/LLaVA weights and
no CLIP BPE vocab, so in-image e2e runs are structural only).

Given mounted paths it executes, in order, printing PASS/FAIL per stage
and a single final verdict:

  1. layered torch->JAX conversion (SDXL base + SUPIR Q/F over it,
     reference SUPIR/util.py:34-51) with a full coverage report —
     FAIL on any missing leaf;
  2. CLIP tokenizer availability (real text conditioning vs the in-image
     hash fallback, utils/tokenizer.py);
  3. a 5-step 512 px restore through the production engine;
  4. one caption through the converted LLaVA stack (if --llava given);
  5. PSNR vs a stored reference output (if --ref_out given).

Usage:
  python tools/load_real.py --opt options/SUPIR_v0.yaml \
      --sdxl /ckpts/sd_xl_base_1.0_0.9vae.safetensors \
      --supir /ckpts/SUPIR-v0Q.ckpt [--llava /ckpts/llava-v1.5-13b] \
      [--img in/low.png] [--ref_out golden/low_restored.png]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class Drill:
    def __init__(self):
        self.results = []

    def record(self, stage: str, ok: bool, detail: str = ""):
        self.results.append((stage, ok, detail))
        print(f"[{'PASS' if ok else 'FAIL'}] {stage}" + (f" — {detail}" if detail else ""))

    def verdict(self) -> int:
        failed = [s for s, ok, _ in self.results if not ok]
        print("=" * 60)
        if failed:
            print(f"VERDICT: FAIL ({len(failed)} stage(s): {', '.join(failed)})")
            return 1
        print(f"VERDICT: PASS ({len(self.results)} stages)")
        return 0


def main(argv=None):
    from supir_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    ap = argparse.ArgumentParser("supir-tpu real-weight readiness drill")
    ap.add_argument("--opt", default="options/SUPIR_v0.yaml")
    ap.add_argument("--sdxl", required=True, help="SDXL base .safetensors")
    ap.add_argument("--supir", default=None, help="SUPIR Q/F .ckpt")
    ap.add_argument("--llava", default=None, help="HF llava-v1.5 checkpoint dir")
    ap.add_argument("--img", default=None, help="LQ test image (synthetic if unset)")
    ap.add_argument("--ref_out", default=None, help="stored golden restore to PSNR against")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--save", default="/tmp/load_real_out.png")
    ap.add_argument("--psnr_min", type=float, default=35.0,
                    help="PSNR bar vs --ref_out (same-pipeline reruns should be ~inf)")
    # smoke-test surface (tests/test_load_real_drill.py): tiny config,
    # random conditioner (tiny checkpoints carry no text towers), and a
    # non-fatal tokenizer stage (this image has no CLIP BPE vocab)
    ap.add_argument("--tiny", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--random_conditioner", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--allow_hash_tokenizer", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from supir_tpu.config import load_yaml_config
    from supir_tpu.models.embedders import ConditionerConfig

    drill = Drill()

    # ---- stage 1: conversion coverage ------------------------------------
    if args.tiny:
        import dataclasses as _dc

        from supir_tpu.config import SUPIRConfig

        # matches tests/ref_oracle tiny width (the smoke checkpoint's dims)
        cfg = _dc.replace(SUPIRConfig.tiny(), ae_dtype="fp32",
                          diffusion_dtype="fp32")
        cond_cfg = None
    else:
        cfg, _extras = load_yaml_config(args.opt)
        cond_cfg = ConditionerConfig()
    t0 = time.time()
    try:
        from supir_tpu.utils.ckpt import load_supir_checkpoint

        params, report = load_supir_checkpoint(
            cfg, args.sdxl, args.supir,
            with_conditioner=not args.random_conditioner,
        )
        ok = not report.missing
        drill.record(
            "conversion", ok,
            f"{report.summary()} in {time.time() - t0:.1f}s"
            + (f"; first missing: {report.missing[:3]}" if report.missing else ""),
        )
        if report.unused:
            print(f"       note: {len(report.unused)} unused torch keys "
                  f"(EMA/opt-state etc.), first: {report.unused[:3]}")
    except Exception as e:
        drill.record("conversion", False, repr(e))
        return drill.verdict()
    if report.missing:
        return drill.verdict()

    # ---- stage 2: tokenizer ----------------------------------------------
    from supir_tpu.utils.tokenizer import tokenize, tokenizer_available

    drill.record(
        "clip-tokenizer", tokenizer_available() or args.allow_hash_tokenizer,
        "real BPE vocab" if tokenizer_available()
        else "hash fallback only — set CLIP_TOKENIZER_PATH / mount openai/clip-vit-large-patch14",
    )

    # ---- stage 3: 5-step restore ------------------------------------------
    try:
        from PIL import Image

        from supir_tpu.engine.supir import SUPIREngine
        from supir_tpu.utils.image import array_to_pil, pil_to_array

        half = jax.default_backend() == "tpu"
        tgt = jnp.bfloat16 if half else jnp.float32
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, tgt if np.asarray(x).dtype == np.float32 else None),
            params,
        )
        engine = SUPIREngine(cfg, params, cond_cfg=cond_cfg)

        if args.img:
            pil = Image.open(args.img).convert("RGB")
        else:  # synthetic LQ: smooth gradient + noise, deterministic
            rng = np.random.default_rng(0)
            yy, xx = np.mgrid[0 : args.size, 0 : args.size]
            base = np.stack([yy, xx, (yy + xx) / 2], -1) / args.size * 255
            arr = np.clip(base + rng.normal(0, 12, base.shape), 0, 255)
            pil = Image.fromarray(arr.astype(np.uint8))
        arr, h0, w0 = pil_to_array(pil, upscale=1.0, min_size=args.size)
        x = jnp.asarray(arr)[None]

        t0 = time.time()
        z = engine.encode_first_stage_with_denoise(x)
        if args.random_conditioner:
            # smoke mode (tiny checkpoints carry no text towers): synthetic
            # conditioning of the right dims, deterministic
            print("       WARNING: conditioning is SYNTHETIC (smoke mode)")
            r = np.random.default_rng(1)
            mk = lambda: {
                "crossattn": jnp.asarray(
                    r.standard_normal((1, 77, cfg.unet.context_dim)) * 0.3,
                    jnp.float32),
                "vector": jnp.asarray(
                    r.standard_normal((1, cfg.unet.adm_in_channels)) * 0.3,
                    jnp.float32),
                "control": z,
            }
            c, uc = mk(), mk()
        else:
            prompt = cfg.p_p
            tok_p = jnp.asarray(tokenize([prompt]))
            tok_n = jnp.asarray(tokenize([cfg.n_p]))
            c, uc = engine.prepare_condition(z, tok_p, tok_p, tok_n, tok_n)
        out = engine.batchify_sample(
            x, c, uc, num_steps=args.steps, cfg_scale=7.5, seed=0,
            color_fix_type="Wavelet", z_override=z,
        )
        out_np = np.asarray(out[0], np.float32)
        finite = np.isfinite(out_np).all()
        drill.record(
            "restore-5step", bool(finite),
            f"{args.steps} steps @{arr.shape[0]}px in {time.time() - t0:.1f}s, "
            f"out range [{out_np.min():.2f}, {out_np.max():.2f}]",
        )
        pil_out = array_to_pil(out_np, h0, w0)
        pil_out.save(args.save)
        print(f"       saved {args.save}")
    except Exception as e:
        drill.record("restore-5step", False, repr(e))
        return drill.verdict()

    # ---- stage 4: caption ---------------------------------------------------
    if args.llava:
        try:
            from supir_tpu.captioner.agent import CaptionerAgent

            t0 = time.time()
            agent = CaptionerAgent.create_default(weights_dir=args.llava, load_4bit=True)
            stage1 = np.asarray(
                (np.clip(np.asarray(engine.batchify_denoise(x))[0], -1, 1) + 1)
                * 127.5, np.uint8,
            )
            caps = agent.gen_image_caption([stage1], temperature=0.0)
            ok = bool(caps and caps[0].strip()) and agent.tokenizer is not None
            drill.record(
                "caption", ok,
                f"{time.time() - t0:.1f}s: {caps[0][:100]!r}" if caps else "empty",
            )
        except Exception as e:
            drill.record("caption", False, repr(e))
    else:
        print("[skip] caption — no --llava dir given")

    # ---- stage 5: PSNR vs stored golden ------------------------------------
    if args.ref_out:
        try:
            from PIL import Image

            ref = np.asarray(Image.open(args.ref_out).convert("RGB"), np.float32)
            got = np.asarray(Image.open(args.save).convert("RGB"), np.float32)
            if ref.shape != got.shape:
                drill.record("psnr", False, f"shape {got.shape} != golden {ref.shape}")
            else:
                mse = float(np.mean((ref - got) ** 2))
                psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
                drill.record(
                    "psnr", psnr >= args.psnr_min,
                    f"{psnr:.2f} dB vs {args.ref_out} (bar {args.psnr_min})",
                )
        except Exception as e:
            drill.record("psnr", False, repr(e))
    else:
        print("[skip] psnr — no --ref_out golden given")

    return drill.verdict()


if __name__ == "__main__":
    raise SystemExit(main())
