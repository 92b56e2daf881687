"""Op-level breakdown of one captioner decode chunk from a jax.profiler
trace (the `bench.py --captioner` path at 13B dims with abstract quantized
weights). Prints ms per decoded token by hlo_category + top ops.

Usage: python tools/profile_captioner.py [--bits 4] [--top 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_bench_agent(bits: int):
    """Same abstract-weights construction as bench.bench_captioner."""
    import bench

    agent, _, _ = bench.make_captioner_agent(bits)
    return agent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default="/tmp/captioner_trace")
    args = ap.parse_args()

    from supir_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    agent, new_tokens = build_bench_agent(args.bits), 64

    img = np.zeros((336, 336, 3), np.uint8)
    t0 = time.perf_counter()
    agent.gen_image_caption([img], temperature=0.0)  # compile + warm
    print(f"warmup {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        agent.gen_image_caption([img], temperature=0.0)
    dt = time.perf_counter() - t0
    ntok = agent.cfg.max_new_tokens
    print(f"wall {dt:.2f}s for {ntok} tokens -> {ntok/dt:.1f} tok/s")

    paths = sorted(glob.glob(os.path.join(
        args.out, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace found under", args.out)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

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

    n = ntok
    cats = {}
    for name, (d, c, b, fl, cat) in rows.items():
        e = cats.setdefault(cat, [0.0, 0, 0.0, 0.0])
        e[0] += d; e[1] += c; e[2] += b; e[3] += fl
    print(f"total device time: {total:.1f} ms -> {total/n:.2f} ms/token "
          f"(wall {dt*1e3/n:.1f} ms/token)")
    print(f"\n{'category':28s} {'ms/tok':>8s} {'calls/tok':>10s} "
          f"{'GB/s':>7s} {'TF/s':>6s}")
    for cat, (d, c, b, fl) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        if d <= 0:
            continue
        print(f"{cat:28s} {d/n:8.3f} {c/n:10.1f} "
              f"{b/(d*1e-3)/1e9:7.0f} {fl/(d*1e-3)/1e12:6.1f}")
    print(f"\n{'op':44s} {'ms/tok':>8s} {'calls/tok':>9s} {'GB/s':>6s}  category")
    for name, (d, c, b, fl, cat) in sorted(rows.items(), key=lambda kv: -kv[1][0])[: args.top]:
        print(f"{name[:44]:44s} {d/n:8.3f} {c/n:9.1f} "
              f"{b/(d*1e-3)/1e9:6.0f}  {cat}")


if __name__ == "__main__":
    main()
