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

    # keep device-track complete events only
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    durs = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "?")
        if name.startswith(("run_", "Infeed", "Outfeed")):
            continue
        dur = ev.get("dur", 0) / 1e3  # ms
        durs[name] += dur
        counts[name] += 1
        total += dur
    print(f"total device time: {total:.2f} ms over 3 steps "
          f"({total/3:.2f} ms/step)")
    print(f"{'ms/step':>9}  {'%':>5}  {'calls':>6}  op")
    for name, d in durs.most_common(args.top):
        print(f"{d/3:9.3f}  {100*d/total:5.1f}  {counts[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
