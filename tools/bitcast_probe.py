"""Probe: can the dequant GEMV get the one-hardware-cast s4 path WITHOUT
ever materializing an s4 jax.Array?

The axon backend RecursionErrors on any eager s4 array creation
(jnp.zeros/astype outputs crossing the jit boundary), which kills the
round-3 int4-native path on the real chip. But if the HBM buffer stays
uint8 and the reinterpretation happens INSIDE the kernel via
pltpu.bitcast, no s4 array ever exists at the jax level.

Checks, on the real chip:
  1. Mosaic legality of pltpu.bitcast(u8[s, l]) -> s4[2s, l] + astype(bf16)
  2. The row/nibble order that bitcast produces (low nibble -> which row?)
  3. Chained-GEMV GB/s of the bitcast kernel vs the shift-pair kernel

Run: python tools/bitcast_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def order_kernel(q_ref, o_ref):
    s4 = pltpu.bitcast(q_ref[:], jnp.int4)
    o_ref[:] = s4.astype(jnp.float32)


def probe_order():
    # bytes: row i col j = 16*(2i+1) + (2i) -> low nibble 2i, high nibble 2i+1
    rows, cols = 8, 128
    b = np.zeros((rows, cols), np.uint8)
    for i in range(rows):
        lo, hi = (2 * i) % 8, (2 * i + 1) % 8
        b[i, :] = (hi << 4) | lo
    q = jnp.asarray(b)
    out = pl.pallas_call(
        order_kernel,
        out_shape=jax.ShapeDtypeStruct((2 * rows, cols), jnp.float32),
    )(q)
    out = np.asarray(out)[:, 0]
    print("bitcast u8->s4 legal; row values:", out[:8].astype(int))
    # expected if row 2i = low nibble: [0,1,2,3,4,5,6,7]
    if np.all(out[: 2 * rows : 2] == (2 * np.arange(rows)) % 8) and np.all(
        out[1 : 2 * rows : 2] == (2 * np.arange(rows) + 1) % 8
    ):
        print("ORDER: byte row i -> s4 rows (2i=LOW nibble, 2i+1=HIGH nibble)")
    elif np.all(out[: 2 * rows : 2] == (2 * np.arange(rows) + 1) % 8):
        print("ORDER: byte row i -> s4 rows (2i=HIGH nibble, 2i+1=LOW)")
    else:
        print("ORDER: something else:", out[:16].astype(int))


def gemv_kernel_bitcast(x_ref, q_ref, s_ref, o_ref):
    s4 = pltpu.bitcast(q_ref[:], jnp.int4)          # [bcin, bout]
    w = s4.astype(x_ref.dtype)                       # ONE hardware cast
    acc = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc * s_ref[:].astype(jnp.float32)


def bench_gemv():
    from supir_tpu.ops.quantize import int4_matmul

    D = 5120
    shapes = {"qkv": (D, 3 * D), "gateup": (D, 2 * 13824),
              "down": (13824, D), "o": (D, D)}
    L = 8
    key = jax.random.PRNGKey(0)

    OUTER = 25  # on-device outer loop: one dispatch covers OUTER*L gemvs
                # (a dispatch+sync RTT costs ~33 ms on the tunnel — see
                # tools/loop_overhead_probe.py — so per-dispatch timings of
                # sub-ms kernels are pure noise)

    def run_chain(mm):
        def wrap(x, ws):
            def body(x, w):
                y = mm(x, w)
                r = jnp.zeros(x.shape, jnp.float32)
                n = min(x.shape[1], y.shape[1])
                r = r.at[:, :n].set(y[:, :n])
                return r.astype(jnp.bfloat16), None

            def outer(i, x):
                x, _ = jax.lax.scan(body, x, ws)
                return x

            return jax.lax.fori_loop(0, OUTER, outer, x)
        return jax.jit(wrap)

    for name, (cin, cout) in shapes.items():
        packed = jax.random.randint(key, (L, cin // 2, cout), 0, 255,
                                    jnp.int32).astype(jnp.uint8)
        scale = jnp.ones((L, 1, cout), jnp.float32)
        gb = cin * cout * L / 2 / 1e9

        def mk_bitcast(bout):
            def mm(x, w):
                q, s = w
                return pl.pallas_call(
                    gemv_kernel_bitcast,
                    grid=(cout // bout,),
                    in_specs=[
                        pl.BlockSpec((x.shape[0], cin), lambda oo: (0, 0)),
                        pl.BlockSpec((cin // 2, bout), lambda oo: (0, oo)),
                        pl.BlockSpec((1, bout), lambda oo: (0, oo)),
                    ],
                    out_specs=pl.BlockSpec((x.shape[0], bout),
                                           lambda oo: (0, oo)),
                    out_shape=jax.ShapeDtypeStruct((x.shape[0], cout),
                                                   jnp.float32),
                )(x, q, s)
            return mm

        x0 = jnp.zeros((8, cin), jnp.bfloat16)
        for bout in (256, 512, 1024, 2048):
            if cout % bout:
                continue
            if cin // 2 * bout > 6 * 2**20:  # block too big for VMEM
                continue
            try:
                f = run_chain(mk_bitcast(bout))
                for _ in range(2):
                    out = f(x0, (packed, scale))
                jax.device_get(out.ravel()[0])
                t0 = time.perf_counter()
                for _ in range(3):
                    out = f(x0, (packed, scale))
                jax.device_get(out.ravel()[0])
                dt = (time.perf_counter() - t0) / (3 * OUTER)
                print(f"  {name:7s} bitcast bout={bout:5d} {dt/L*1e3:7.3f} ms/gemv "
                      f"{gb/dt:5.0f} GB/s ({gb/dt/819*100:3.0f}%)")
            except Exception as e:  # noqa: BLE001
                print(f"  {name:7s} bitcast bout={bout}: FAILED "
                      f"{type(e).__name__}: {e}"[:160])

        # shift-pair production kernel for comparison
        f = run_chain(lambda x, w: int4_matmul(x, w[0], w[1]))
        for _ in range(2):
            out = f(x0, (packed, scale))
        jax.device_get(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(x0, (packed, scale))
        jax.device_get(out.ravel()[0])
        dt = (time.perf_counter() - t0) / (3 * OUTER)
        print(f"  {name:7s} shiftpair          {dt/L*1e3:7.3f} ms/gemv "
              f"{gb/dt:5.0f} GB/s ({gb/dt/819*100:3.0f}%)")


if __name__ == "__main__":
    from supir_tpu.utils.cache import enable_compilation_cache
    from supir_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compilation_cache()
    print("backend =", jax.default_backend())
    probe_order()
    bench_gemv()
