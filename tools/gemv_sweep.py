"""Per-kernel GB/s sweep for the decode dequant-GEMVs on the real chip.

decode_decompose showed the 40-layer GEMV scan at ~304 GB/s (37% of the
v5e's 819); the per-launch isolated timings are tunnel-dispatch-bound and
useless. This tool times each GEMV variant as a chained lax.scan over L
DISTINCT weight copies (so nothing caches in VMEM and launch overhead
amortizes), weights passed as jit ARGS (a captured 6 GB constant tree
evicted the agent params and invalidated decode_decompose's section G).

Variants per shape:
  packed   — uint8 half-split, shift-pair unpack (legacy production)
  paired   — adjacent-pair uint8 + in-kernel bitcast, ONE s4->bf16 cast
  native   — Pallas s4 block + one hardware s4->bf16 cast
  xla_s4   — plain jnp.dot(x, q.astype(bf16)) on an s4 array (XLA fusion)
  int8     — int8 kernel (2x the bytes, no nibble work) for reference
  w4a8     — paired layout, s4->s8 cast (narrow VPU op) + NATIVE int8 MXU
             dot; activation dynamically quantized to int8 per call. If the
             s4->bf16 widening cast is the ~1 Telem/s ceiling, this should
             clear it: the MXU eats s8 directly and the VPU only does a
             4->8 bit widen.
  s4mxu    — paired layout, s4 operand handed STRAIGHT to dot_general
             (int8 activations, s4 weights) — probes whether Mosaic can
             feed the MXU sub-byte operands with no VPU cast at all.

Run: python tools/gemv_sweep.py [--layers 8] [--reps 20]
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

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, HID = 5120, 13824


def _w4a8_kernel(x_ref, q_ref, s_ref, o_ref, *, direct):
    s4 = pltpu.bitcast(q_ref[:], jnp.int4)
    w = s4 if direct else s4.astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:].astype(jnp.float32)


def w4a8_matmul(xq, packed, scale, direct=False):
    """xq [B, cin] int8 @ paired-packed s4 -> [B, cout] fp32 (pre-activation
    scale; caller multiplies the activation scale back in)."""
    from supir_tpu.ops.quantize import _paired_bout

    cin2, cout = packed.shape
    cin = 2 * cin2
    bout = _paired_bout(cin, cout)
    b = xq.shape[0]
    bpad = (-b) % 8
    xb = jnp.pad(xq, ((0, bpad), (0, 0))) if bpad else xq
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, direct=direct),
        grid=(cout // bout,),
        in_specs=[
            pl.BlockSpec((xb.shape[0], cin), lambda oo: (0, 0)),
            pl.BlockSpec((cin2, bout), lambda oo: (0, oo)),
            pl.BlockSpec((1, bout), lambda oo: (0, oo)),
        ],
        out_specs=pl.BlockSpec((xb.shape[0], bout), lambda oo: (0, oo)),
        out_shape=jax.ShapeDtypeStruct((xb.shape[0], cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(xb, packed, scale)
    return out[:b]
SHAPES = {
    "qkv":    (D, 3 * D),
    "gateup": (D, 2 * HID),
    "down":   (HID, D),
    "o":      (D, D),
}


def timeit(f, *args, reps=20, warm=2):
    for _ in range(warm):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps


def chained(mm, cin, layers, inner=1):
    """scan over L weight copies; output folded back to a [1,cin] carry so
    layers stay data-dependent. `inner` wraps the scan in an on-device
    fori_loop so ONE dispatch covers inner*L GEMVs — the 33 ms fixed
    tunnel dispatch+sync cost needs >=100 ms of device work amortized
    behind one readback or every number is RTT noise (the carry feeds
    through so XLA LICM can't hoist the loop body)."""

    @jax.jit
    def run(x, ws):
        def body(x, w):
            y = mm(x, w)  # [1, cout] fp32
            # fold cout back to cin deterministically (cheap, keeps dependence)
            y = y.reshape(1, -1)
            r = jnp.zeros((1, cin), jnp.float32)
            n = min(cin, y.shape[1])
            r = r.at[:, :n].set(y[:, :n])
            return r.astype(jnp.bfloat16), None

        def outer(_, x):
            x, _ = jax.lax.scan(body, x, ws)
            return x

        return jax.lax.fori_loop(0, inner, outer, x)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--kinds", default="paired,w4a8,s4mxu,packed,native,"
                    "xla_s4,int8", help="comma list of variants to time")
    ap.add_argument("--shapes", default="qkv,gateup,down,o")
    ap.add_argument("--inner", type=int, default=8,
                    help="on-device fori_loop reps per dispatch (RTT "
                         "amortization; inner*layers GEMVs per readback)")
    args = ap.parse_args()

    from supir_tpu.ops.quantize import (
        int4_matmul, int4_native_matmul, int4_paired_matmul, int8_matmul)
    from supir_tpu.utils.cache import enable_compilation_cache
    from supir_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compilation_cache()
    print(f"backend={jax.default_backend()} L={args.layers}")
    L = args.layers
    key = jax.random.PRNGKey(0)

    def mk(cin, cout, kind):
        if kind in ("packed", "paired", "w4a8", "s4mxu"):
            return {
                "q4": jax.random.randint(key, (L, cin // 2, cout), 0, 255, jnp.int32).astype(jnp.uint8),
                "scale": jnp.ones((L, 1, cout), jnp.float32),
            }
        if kind in ("native", "xla_s4"):
            return {
                "qn": jax.random.randint(key, (L, cin, cout), -7, 8, jnp.int32).astype(jnp.int4),
                "scale": jnp.ones((L, 1, cout), jnp.float32),
            }
        return {
            "q": jax.random.randint(key, (L, cin, cout), -127, 128, jnp.int32).astype(jnp.int8),
            "scale": jnp.ones((L, 1, cout), jnp.float32),
        }

    def mm_of(kind):
        if kind == "packed":
            return lambda x, w: int4_matmul(x, w["q4"], w["scale"])
        if kind == "paired":
            return lambda x, w: int4_paired_matmul(x, w["q4"], w["scale"])
        if kind == "native":
            return lambda x, w: int4_native_matmul(x, w["qn"], w["scale"])
        if kind == "xla_s4":
            return lambda x, w: (
                jnp.dot(x, w["qn"].astype(x.dtype),
                        preferred_element_type=jnp.float32)
                * w["scale"].astype(jnp.float32))
        if kind in ("w4a8", "s4mxu"):
            def mm(x, w, direct=(kind == "s4mxu")):
                # dynamic per-call activation quant (the real path pays this)
                xs = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6)
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / xs * 127.0), -127, 127
                ).astype(jnp.int8)
                y = w4a8_matmul(xq, w["q4"], w["scale"], direct=direct)
                return y * (xs.astype(jnp.float32) / 127.0)
            return mm
        return lambda x, w: int8_matmul(x, w["q"], w["scale"])

    for name, (cin, cout) in SHAPES.items():
        if name not in args.shapes.split(","):
            continue
        gb = cin * cout * L / 2 / 1e9  # int4 bytes
        for kind in args.kinds.split(","):
            bytes_gb = gb * (2 if kind == "int8" else 1)
            try:
                ws = mk(cin, cout, kind)
                run = chained(mm_of(kind), cin, L, inner=args.inner)
                x0 = jnp.zeros((1, cin), jnp.bfloat16)
                dt = timeit(run, x0, ws, reps=args.reps) / args.inner
                per = dt / L * 1e3
                print(f"  {name:7s} {kind:7s} {per:7.3f} ms/gemv  "
                      f"{bytes_gb/dt:5.0f} GB/s ({bytes_gb/dt/819*100:4.0f}%)")
                del ws
            except Exception as e:  # noqa: BLE001
                print(f"  {name:7s} {kind:7s} FAILED: {type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
