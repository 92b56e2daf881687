"""Op-level breakdown of the denoiser step from a jax.profiler trace.

Runs a few full-width denoiser steps under jax.profiler.trace, then parses
the generated perfetto trace JSON and aggregates device-op durations by
fusion/op name. No tensorboard needed.

Usage: python tools/profile_trace.py [--size 1024] [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import functools
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default="/tmp/supir_trace")
    args = ap.parse_args()

    from supir_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from supir_tpu.config import SUPIRConfig
    from supir_tpu.engine.factory import create_engine
    from supir_tpu.utils.profiling import sync

    cfg = SUPIRConfig(ae_dtype="bf16", diffusion_dtype="bf16")
    engine = create_engine(cfg, cond_cfg=None, rng=jax.random.PRNGKey(0),
                           image_size=64, param_dtype=jnp.bfloat16)
    params = engine.params
    lat = args.size // 8
    b = 2
    x = jnp.zeros((b, lat, lat, 4), jnp.float32)
    sigma = jnp.full((b,), 7.0, jnp.float32)
    ca = jnp.zeros((b, 77, cfg.unet.context_dim), jnp.bfloat16)
    vec = jnp.zeros((b, cfg.unet.adm_in_channels), jnp.bfloat16)
    ctrl = jnp.zeros((b, lat, lat, 4), jnp.float32)

    @jax.jit
    def full_step(params, x, sigma, ca, vec, ctrl):
        cond = {"crossattn": ca, "vector": vec, "control": ctrl}
        return engine.denoiser(
            functools.partial(engine._network, params), x, sigma, cond, 1.0
        )

    sync(full_step(params, x, sigma, ca, vec, ctrl))  # compile
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(3):
            sync(full_step(params, x, sigma, ca, vec, ctrl))

    paths = sorted(glob.glob(os.path.join(
        args.out, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace found under", args.out)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # Roofline aggregation from the per-op HLO metadata the TPU profiler
    # embeds in the event args: `hlo_category` is the TRUTH for bucketing
    # (fusion NAMES lie — a "convert_multiply_fusion" is usually a conv),
    # and bytes_accessed/model_flops give achieved GB/s and TF/s per op.
    rows = {}
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        a = ev.get("args") or {}
        if "hlo_category" not in a:
            continue
        name = ev.get("name", "?")
        r = rows.setdefault(name, [0.0, 0, 0.0, 0.0, a.get("hlo_category", "")])
        r[0] += ev.get("dur", 0) / 1e3  # ms
        r[1] += 1
        r[2] += float(a.get("bytes_accessed", 0) or 0)
        r[3] += float(a.get("model_flops", 0) or 0)
        total += ev.get("dur", 0) / 1e3

    cats = {}
    for name, (d, c, b, fl, cat) in rows.items():
        e = cats.setdefault(cat, [0.0, 0, 0.0, 0.0])
        e[0] += d; e[1] += c; e[2] += b; e[3] += fl
    print(f"total device time: {total:.2f} ms over 3 steps "
          f"({total/3:.2f} ms/step)")
    print(f"\n{'category':28s} {'ms/step':>8s} {'calls/step':>10s} "
          f"{'GB/s':>7s} {'TF/s':>6s}")
    for cat, (d, c, b, fl) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        if d <= 0:
            continue
        print(f"{cat:28s} {d/3:8.2f} {c/3:10.0f} "
              f"{b/(d*1e-3)/1e9:7.0f} {fl/(d*1e-3)/1e12:6.1f}")
    print(f"\n{'op':40s} {'ms/step':>8s} {'GB/s':>6s} {'TF/s':>6s}  category")
    for name, (d, c, b, fl, cat) in sorted(rows.items(), key=lambda kv: -kv[1][0])[: args.top]:
        print(f"{name[:40]:40s} {d/3:8.3f} {b/(d*1e-3)/1e9:6.0f} "
              f"{fl/(d*1e-3)/1e12:6.1f}  {cat}")


if __name__ == "__main__":
    main()
