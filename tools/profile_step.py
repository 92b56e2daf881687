"""Per-component timing of the SUPIR denoise step at full SDXL width.

Times (on the real TPU, random bf16 weights — values don't affect
throughput): the CFG-batched full step (GLVControl + LightGLVUNet),
the plain UNet alone, the control branch alone, and the VAE decode,
so we can see where the 50-step budget actually goes.

Usage: python tools/profile_step.py [--size 1024] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2):
    from supir_tpu.utils.profiling import sync

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-vae", action="store_true")
    args = ap.parse_args()

    from supir_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from supir_tpu.config import SUPIRConfig
    from supir_tpu.engine.factory import create_engine

    cfg = SUPIRConfig(ae_dtype="bf16", diffusion_dtype="bf16")
    engine = create_engine(cfg, cond_cfg=None, rng=jax.random.PRNGKey(0),
                           image_size=64, param_dtype=jnp.bfloat16)
    params = engine.params
    lat = args.size // 8
    b = 2  # CFG batch
    x = jnp.zeros((b, lat, lat, 4), jnp.float32)
    sigma = jnp.full((b,), 7.0, jnp.float32)
    ca = jnp.zeros((b, 77, cfg.unet.context_dim), jnp.bfloat16)
    vec = jnp.zeros((b, cfg.unet.adm_in_channels), jnp.bfloat16)
    ctrl_lat = jnp.zeros((b, lat, lat, 4), jnp.float32)

    @jax.jit
    def full_step(params, x, sigma, ca, vec, ctrl_lat):
        cond = {"crossattn": ca, "vector": vec, "control": ctrl_lat}
        return engine.denoiser(
            functools.partial(engine._network, params), x, sigma, cond, 1.0
        )

    @jax.jit
    def control_only(params, x, sigma, ca, vec, ctrl_lat):
        return engine.control_net.apply(
            {"params": params["control"]}, ctrl_lat, sigma, x, ca, vec)

    t_full = timeit(full_step, params, x, sigma, ca, vec, ctrl_lat, iters=args.iters)
    print("full step done", flush=True)
    t_ctrl = timeit(control_only, params, x, sigma, ca, vec, ctrl_lat, iters=args.iters)
    print(f"full denoiser step (CFG batch 2): {t_full*1e3:9.2f} ms "
          f"-> {t_full*50:6.2f} s / 50 steps", flush=True)
    print(f"control branch alone:             {t_ctrl*1e3:9.2f} ms", flush=True)
    print(f"unet share (full - control):      {(t_full-t_ctrl)*1e3:9.2f} ms", flush=True)

    if not args.skip_vae:
        z = jnp.zeros((1, lat, lat, 4), jnp.float32)
        img = jnp.zeros((1, args.size, args.size, 3), jnp.float32)

        @jax.jit
        def dec(params, z):
            return engine.vae.apply({"params": params["vae"]}, z, method=engine.vae.decode)

        @jax.jit
        def enc(params, img):
            return engine.vae.apply({"params": params["vae"]}, img, True, method=engine.vae.moments)

        t_dec = timeit(dec, params, z, iters=max(2, args.iters // 2))
        t_enc = timeit(enc, params, img, iters=max(2, args.iters // 2))
        print(f"VAE decode {args.size}px:           {t_dec*1e3:9.2f} ms", flush=True)
        print(f"VAE encode {args.size}px:           {t_enc*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
