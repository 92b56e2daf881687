"""Batch restoration CLI — the `test.py` surface of the reference
(test.py:20-105), TPU-native.

Flags mirror the reference (upscale, SUPIR_sign, edm_steps, s_churn,
s_noise, s_cfg, restoration scale, linear CFG/control schedules, color fix,
tile VAE, no_llava, ...). Device split (reference: SUPIR on cuda:0, LLaVA on
cuda:1) becomes mesh partitioning; captioning is optional exactly like
`--no_llava`.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser("supir-tpu batch restorer")
    ap.add_argument("--img_dir", type=str, required=True)
    ap.add_argument("--save_dir", type=str, required=True)
    ap.add_argument("--opt", type=str, default="options/SUPIR_v0.yaml")
    ap.add_argument("--upscale", type=float, default=1.0)
    ap.add_argument("--SUPIR_sign", type=str, default="Q", choices=["F", "Q"])
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--min_size", type=int, default=1024)
    ap.add_argument("--edm_steps", type=int, default=50)
    ap.add_argument("--s_stage1", type=float, default=-1.0)
    ap.add_argument("--s_churn", type=float, default=5.0)
    ap.add_argument("--s_noise", type=float, default=1.003)
    ap.add_argument("--s_cfg", type=float, default=7.5)
    ap.add_argument("--s_stage2", type=float, default=1.0)
    ap.add_argument("--num_samples", type=int, default=1)
    ap.add_argument("--a_prompt", type=str, default=None)
    ap.add_argument("--n_prompt", type=str, default=None)
    ap.add_argument("--gamma_correction", type=float, default=1.0,
                    help="input gamma (reference UI knob, gradio_demo.py:112-115)")
    ap.add_argument("--color_fix_type", type=str, default="Wavelet",
                    choices=["None", "AdaIn", "Wavelet"])
    ap.add_argument("--linear_CFG", action="store_true", default=True)
    ap.add_argument("--no_linear_CFG", dest="linear_CFG", action="store_false")
    ap.add_argument("--linear_s_stage2", action="store_true", default=False)
    ap.add_argument("--spt_linear_CFG", type=float, default=4.0)
    ap.add_argument("--spt_linear_s_stage2", type=float, default=0.0)
    ap.add_argument("--no_llava", action="store_true", default=False)
    ap.add_argument("--load_8bit_llava", action="store_true", default=False)
    ap.add_argument("--load_4bit_llava", action="store_true", default=False)
    ap.add_argument("--use_tile_vae", action="store_true", default=False)
    ap.add_argument("--encoder_tile_size", type=int, default=512)
    ap.add_argument("--decoder_tile_size", type=int, default=64)
    ap.add_argument("--sampler", type=str, default=None,
                    choices=["RestoreEDM", "RestoreDPMPP2M", "EulerEDM", "HeunEDM",
                             "EulerAncestral", "DPMPP2SAncestral", "DPMPP2M",
                             "LMS", "Substep"],
                    help="override the config sampler")
    ap.add_argument("--use_tiled_sampling", action="store_true", default=False)
    ap.add_argument("--sampler_tile_size", type=int, default=128)
    ap.add_argument("--sampler_tile_stride", type=int, default=64)
    ap.add_argument("--loading_half_params", action="store_true", default=None,
                    help="hold params in bf16 (reference flag; default ON on TPU)")
    ap.add_argument("--full_params", dest="loading_half_params", action="store_false")
    ap.add_argument("--ae_dtype", type=str, default=None, choices=["bf16", "fp32"],
                    help="autoencoder compute dtype (reference test.py --ae_dtype)")
    ap.add_argument("--diff_dtype", type=str, default=None,
                    choices=["fp16", "bf16", "fp32"],
                    help="diffusion compute dtype (reference test.py "
                         "--diff_dtype; fp16 maps to bf16 on TPU)")
    # TPU-specific additions
    ap.add_argument("--random_weights", action="store_true",
                    help="run with random init (no checkpoints; smoke/benchmark)")
    ap.add_argument("--tiny", action="store_true",
                    help="width-scaled tiny model (CI smoke)")
    ap.add_argument("--profile_dir", type=str, default=None,
                    help="write a jax profiler trace of the sample phase")
    ap.add_argument("--feature_cache_interval", type=int, default=0,
                    help="cross-step encoder/control feature cache for "
                         "RestoreEDM (0=off/exact, N>1 recomputes every N "
                         "steps — DeepCache-style opt-in speedup)")
    return ap


def create_engine_from_args(args):
    import jax

    from supir_tpu.config import load_yaml_config
    from supir_tpu.engine.factory import create_engine, tiny_test_config
    from supir_tpu.models.embedders import ConditionerConfig

    import jax.numpy as jnp

    half = getattr(args, "loading_half_params", None)
    if half is None:
        half = jax.default_backend() == "tpu"
    param_dtype = jnp.bfloat16 if half else None

    if args.tiny:
        cfg, cond_cfg = tiny_test_config()
        engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
        return engine, cfg
    cfg, extras = load_yaml_config(args.opt)
    # reference test.py --ae_dtype / --diff_dtype (fp16 maps to bf16: the
    # TPU half type; the reference itself bans fp16 autoencoders,
    # SUPIR_model.py:24)
    dt_map = {"fp16": "bf16", "bf16": "bf16", "fp32": "fp32"}
    if getattr(args, "ae_dtype", None) or getattr(args, "diff_dtype", None):
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg,
            ae_dtype=dt_map[args.ae_dtype] if args.ae_dtype else cfg.ae_dtype,
            diffusion_dtype=(
                dt_map[args.diff_dtype] if args.diff_dtype else cfg.diffusion_dtype
            ),
        )
    cond_cfg = ConditionerConfig()
    ckpt = extras.get("SDXL_CKPT")
    supir_ckpt = extras.get(f"SUPIR_CKPT_{args.SUPIR_sign}")
    if ckpt and os.path.exists(ckpt):
        from supir_tpu.engine.supir import SUPIREngine
        from supir_tpu.utils.ckpt import load_supir_checkpoint

        params, report = load_supir_checkpoint(cfg, ckpt, supir_ckpt)
        print("checkpoint conversion:", report.summary())
        tgt = jnp.bfloat16 if half else jnp.float32
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, tgt if x.dtype == np.float32 else None), params
        )
        engine = SUPIREngine(cfg, params, cond_cfg=cond_cfg)
    elif args.random_weights:
        engine = create_engine(
            cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64,
            param_dtype=param_dtype,
        )
    else:
        raise SystemExit(
            f"no checkpoint at {ckpt!r}; set SDXL_CKPT in {args.opt} or pass "
            "--random_weights for a smoke run"
        )
    return engine, cfg


def main(argv=None):
    from supir_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    from supir_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from supir_tpu.utils.image import array_to_pil, pil_to_array
    from supir_tpu.utils.tokenizer import tokenize

    engine, cfg = create_engine_from_args(args)
    if args.use_tile_vae:
        engine.init_tile_vae(args.encoder_tile_size, args.decoder_tile_size)

    os.makedirs(args.save_dir, exist_ok=True)
    names = sorted(
        f for f in os.listdir(args.img_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp", ".bmp"))
    )

    captioner = None
    if not args.no_llava:
        try:
            from supir_tpu.captioner.agent import CaptionerAgent

            captioner = CaptionerAgent.create_default(
                load_8bit=args.load_8bit_llava, load_4bit=args.load_4bit_llava
            )
        except Exception as e:
            print(f"[warn] captioner unavailable ({e}); proceeding without")

    p_p = args.a_prompt if args.a_prompt is not None else cfg.p_p
    n_p = args.n_prompt if args.n_prompt is not None else cfg.n_p

    for name in names:
        t_start = time.perf_counter()
        img = Image.open(os.path.join(args.img_dir, name)).convert("RGB")
        arr, h0, w0 = pil_to_array(img, upscale=args.upscale, min_size=args.min_size,
                                   gamma=args.gamma_correction)
        x = jnp.asarray(arr)[None]

        timings = {}
        t0 = time.perf_counter()
        z = engine.encode_first_stage_with_denoise(x)
        x_stage1_img = engine.decode_first_stage(z)
        jax.device_get(x_stage1_img[0, :1, :1, 0])
        timings["stage1"] = time.perf_counter() - t0

        caption = ""
        if captioner is not None:
            # reference parity (test.py:84-92): the captioner sees the stage-1
            # denoise of a fix_resize=512 version of the LQ image, not the
            # full-res stage-1 output.
            t0 = time.perf_counter()
            arr512, h1, w1 = pil_to_array(
                img, upscale=args.upscale, min_size=args.min_size, fix_resize=512
            )
            x512 = engine.batchify_denoise(jnp.asarray(arr512)[None])
            cap_img = array_to_pil(np.asarray(x512[0]), h1, w1)
            caption = captioner.gen_image_caption([np.asarray(cap_img)])[0]
            timings["caption"] = time.perf_counter() - t0

        prompt = caption + p_p
        tok_l = jnp.asarray(tokenize([prompt] * args.num_samples))
        tok_n = jnp.asarray(tokenize([n_p] * args.num_samples))

        zN = jnp.repeat(z, args.num_samples, axis=0)
        xN = jnp.repeat(x, args.num_samples, axis=0)
        c, uc = engine.prepare_condition(zN, tok_l, tok_l, tok_n, tok_n)

        t0 = time.perf_counter()
        sample_kwargs = dict(
            num_steps=args.edm_steps,
            restoration_scale=args.s_stage1 if args.s_stage1 >= 0 else cfg.sampler.restore_cfg,
            s_churn=args.s_churn,
            s_noise=args.s_noise,
            cfg_scale=args.s_cfg,
            control_scale=args.s_stage2,
            seed=args.seed,
            color_fix_type=args.color_fix_type,
            use_linear_cfg=args.linear_CFG,
            use_linear_control_scale=args.linear_s_stage2,
            cfg_scale_start=args.spt_linear_CFG,
            control_scale_start=args.spt_linear_s_stage2,
            z_override=zN,
        )
        if args.feature_cache_interval and not args.use_tiled_sampling:
            sample_kwargs["feature_cache_interval"] = args.feature_cache_interval
        if args.sampler:
            sample_kwargs["sampler_name"] = (
                ("TiledRestoreDPMPP2M" if "DPMPP" in args.sampler else "TiledRestoreEDM")
                if args.use_tiled_sampling else args.sampler
            )
        if args.profile_dir:
            jax.profiler.start_trace(args.profile_dir)
        if args.use_tiled_sampling:
            samples = engine.batchify_sample_tiled(
                xN, c, uc, tile_size=args.sampler_tile_size,
                tile_stride=args.sampler_tile_stride, **sample_kwargs,
            )
        else:
            samples = engine.batchify_sample(xN, c, uc, **sample_kwargs)
        jax.device_get(samples[0, :1, :1, 0])
        if args.profile_dir:
            jax.profiler.stop_trace()
        timings["sample"] = time.perf_counter() - t0

        base = os.path.splitext(name)[0]
        for i in range(args.num_samples):
            out = array_to_pil(np.asarray(samples[i]), h0, w0)
            out.save(os.path.join(args.save_dir, f"{base}_{i}.png"))
        total = time.perf_counter() - t_start
        phase_str = " ".join(f"{k}={v:.2f}s" for k, v in timings.items())
        print(f"{name}: {total:.2f}s ({phase_str}) caption={caption[:60]!r}")


if __name__ == "__main__":
    main()
