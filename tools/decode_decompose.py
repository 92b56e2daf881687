"""Itemize the captioner decode step: where do 18.7 ms/token go?

The round-3 claim was "160 Pallas GEMV launches/token + scan epilogues" —
asserted from the trace categories, never itemized. This probe times the
decode's constituent programs in isolation at 13B dims on the real chip:

  A. one fused-qkv GEMV   [1,5120]x[5120,15360]   (int4 / int4-native / int8 / XLA-unpack)
  B. one gateup GEMV      [1,5120]x[5120,27648]
  C. one down GEMV        [1,13824]x[13824,5120]
  D. one o GEMV           [1,5120]x[5120,5120]
  E. 40-layer scan of (A..D) GEMVs ONLY (no attention/norms) -> per-layer overhead
  F. attention decode step alone (bf16 cache read at cache_len 1280, 40 layers)
  G. RMSNorm + rotary + cache-update residue (full step minus E minus F, by
     timing the real decode chunk)

Each timing is GB/s vs the leaf's HBM bytes, so the gap to the 819 GB/s
weight-streaming roofline is attributed per component.

Run: python tools/decode_decompose.py [--bits 4] [--native]
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
import numpy as np

D, HID, HEADS, LAYERS, CACHE = 5120, 13824, 40, 40, 1280
HD = D // HEADS


def timeit(f, *args, reps=30, warm=3):
    """One dispatch+sync through the tunnel costs ~33 ms FIXED
    (tools/loop_overhead_probe.py), so per-dispatch timings are garbage
    below ~100 ms of device work. Chain `reps` dispatches (they pipeline;
    only ~one RTT is exposed) and subtract nothing — callers must pick
    reps so reps*t >> 33 ms."""
    for _ in range(warm):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps


def timeit_fori(one_iter, x0, n=200):
    """Amortize the ~33 ms dispatch RTT over n on-device iterations.
    one_iter: x -> x (must keep a data dependence on x, else LICM hoists
    the body and the loop times as empty)."""

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, n, lambda i, x: one_iter(x), x)

    out = loop(x0)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    out = loop(x0)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def gemv_bytes(cin, cout, bits):
    return cin * cout * (0.5 if bits == 4 else 1)


def make_w(cin, cout, bits, native):
    if bits == 4 and native:
        return {"qn": jnp.zeros((cin, cout), jnp.int4),
                "scale": jnp.ones((1, cout), jnp.float32)}
    if bits == 4:
        return {"q4": jnp.zeros((cin // 2, cout), jnp.uint8),
                "scale": jnp.ones((1, cout), jnp.float32)}
    return {"q": jnp.zeros((cin, cout), jnp.int8),
            "scale": jnp.ones((1, cout), jnp.float32)}


def gemv_fn(bits, native):
    from supir_tpu.ops.quantize import int4_matmul, int4_native_matmul, int8_matmul

    if bits == 4 and native:
        return lambda x, w: int4_native_matmul(x, w["qn"], w["scale"])
    if bits == 4:
        return lambda x, w: int4_matmul(x, w["q4"], w["scale"])
    return lambda x, w: int8_matmul(x, w["q"], w["scale"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--native", action="store_true")
    ap.add_argument("--skip_full", action="store_true",
                    help="skip section G (builds the full 13B agent, ~4 min)")
    args = ap.parse_args()

    from supir_tpu.utils.cache import enable_compilation_cache
    from supir_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compilation_cache()
    print(f"backend={jax.default_backend()} bits={args.bits} native={args.native}")

    mm = gemv_fn(args.bits, args.native)
    shapes = {
        "qkv":    (D, 3 * D),
        "gateup": (D, 2 * HID),
        "down":   (HID, D),
        "o":      (D, D),
    }
    ws = {k: make_w(cin, cout, args.bits, args.native)
          for k, (cin, cout) in shapes.items()}
    per_layer_ms = 0.0
    for k, (cin, cout) in shapes.items():
        x0 = jnp.zeros((1, cin), jnp.bfloat16)

        def one_iter(x, w=ws[k], cin=cin):
            y = mm(x, w)
            # feed a cin-sized view back so the loop body depends on x
            reps_needed = -(-cin // y.shape[-1])
            y = jnp.tile(y, (1, reps_needed))[:, :cin]
            return (y * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)

        dt = timeit_fori(one_iter, x0, n=300)
        gb = gemv_bytes(cin, cout, args.bits) / 1e9
        per_layer_ms += dt * 1e3
        print(f"  {k:7s} [{cin:6d}x{cout:6d}] {dt*1e3:7.3f} ms  "
              f"{gb/dt:6.0f} GB/s ({gb/dt/819*100:4.0f}% of 819)")

    # E: scan over 40 layers of the 4 GEMVs chained (data dependence kept
    # through a D-dim residual so XLA cannot parallelize layers)
    def layer(x, w):
        q = mm(x, w["qkv"])[:, :D]
        o = mm(q.astype(jnp.bfloat16), w["o"])
        g = mm(o.astype(jnp.bfloat16), w["gateup"])[:, :HID]
        d = mm(g.astype(jnp.bfloat16), w["down"])
        return (x + d).astype(jnp.bfloat16)

    stacked = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (LAYERS,) + a.shape), ws)

    def scan_gemvs(x):
        def body(x, w):
            return layer(x, w), None
        x, _ = jax.lax.scan(body, x, stacked)
        return x

    x0 = jnp.zeros((1, D), jnp.bfloat16)
    dt_scan = timeit_fori(scan_gemvs, x0, n=20)
    total_gb = sum(gemv_bytes(*shapes[k], args.bits) for k in shapes) * LAYERS / 1e9
    print(f"  E scan40x4GEMV {dt_scan*1e3:7.2f} ms  {total_gb/dt_scan:6.0f} GB/s "
          f"({total_gb/dt_scan/819*100:4.0f}%)  per-layer {dt_scan/LAYERS*1e3:6.3f} ms "
          f"vs isolated {per_layer_ms:6.3f} ms")

    # F: attention decode step alone, 40 layers: q [1,1,H,HD] vs bf16 cache
    ck = jnp.zeros((LAYERS, 1, CACHE, HEADS, HD), jnp.bfloat16)
    cv = jnp.zeros_like(ck)

    def scan_attn(q):
        def body(carry, kv):
            k, v = kv
            logits = jnp.einsum("bshd,blhd->bhsl", carry, k) / np.sqrt(HD)
            p = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhsl,blhd->bshd", p, v)
            return out.astype(jnp.bfloat16), None
        q, _ = jax.lax.scan(body, q, (ck, cv))
        return q

    q0 = jnp.zeros((1, 1, HEADS, HD), jnp.bfloat16)
    dt_attn = timeit_fori(scan_attn, q0, n=20)
    kv_gb = ck.nbytes * 2 / 1e9
    print(f"  F scan40xATTN  {dt_attn*1e3:7.2f} ms  cache {kv_gb:.2f} GB -> "
          f"{kv_gb/dt_attn:6.0f} GB/s ({kv_gb/dt_attn/819*100:4.0f}%)")

    # G: the real decode chunk for reference
    if args.skip_full:
        return
    import bench

    agent, _, _ = bench.make_captioner_agent(args.bits, int4_native=args.native)
    cfg = agent.cfg
    _, _, decode_chunk = agent._prefill_decode
    caches = agent.llama.init_cache(1, cfg.cache_len, dtype=agent._kv_dtype)
    tok = jnp.zeros((1,), jnp.int32)
    pos0 = jnp.full((1,), 64, jnp.int32)
    rng = jax.random.PRNGKey(0)
    toks, caches = decode_chunk(agent.params, tok, pos0, caches, rng, 0.0, 0.7)
    jax.device_get(toks[0, 0])
    n, chunk = 8, toks.shape[0]
    t0 = time.perf_counter()
    for i in range(n):
        toks, caches = decode_chunk(
            agent.params, toks[-1], pos0 + (i + 1) * chunk, caches, rng, 0.0, 0.7)
    jax.device_get(toks[0, 0])
    ms_tok = (time.perf_counter() - t0) / (n * chunk) * 1e3
    lm_head_ms = 0.33 / 819 * 1e3  # bf16 head read
    resid = ms_tok - dt_scan * 1e3 - dt_attn * 1e3 - lm_head_ms
    print(f"  G full decode  {ms_tok:7.2f} ms/token")
    print(f"  attribution: GEMVs {dt_scan*1e3:.2f} + attn {dt_attn*1e3:.2f} + "
          f"head ~{lm_head_ms:.2f} + OTHER {resid:.2f} ms "
          f"(norms/rotary/cache-update/epilogues)")


if __name__ == "__main__":
    main()
