"""Find the achievable HBM streaming ceiling for decode-GEMV access
patterns on this chip, to locate where the dequant kernel's 4x gap to
819 GB/s actually comes from.

Ladder (all on [5120, 15360]-ish weights, L=8 distinct copies, unrolled):
  sum_pallas   — pallas grid reduce: block (cin/2, bout) u8, sum into f32
                 (pure stream; no MXU, no cast)
  sum_xla      — jnp.sum over the stacked u8 tree (XLA's own stream rate)
  dot_bf16_xla — plain jnp.dot GEMV on bf16 weights (2x bytes, XLA-native)
  qmm variants — production kernel with bout 512..4096 and 2D grid

Run: python tools/stream_ceiling.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CIN, COUT, L = 5120, 15360, 8


def timeit(f, *args, reps=20, warm=2):
    for _ in range(warm):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps


def report(name, dt, gbytes):
    print(f"  {name:26s} {dt*1e3:8.3f} ms  {gbytes/dt:5.0f} GB/s "
          f"({gbytes/dt/819*100:3.0f}%)")


def sum_kernel(q_ref, o_ref):
    oo = pl.program_id(0)

    @pl.when(oo == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.sum(q_ref[:].astype(jnp.int32), axis=0, keepdims=True,
                        dtype=jnp.int32).astype(jnp.float32)


def main():
    from supir_tpu.utils.cache import enable_compilation_cache
    from supir_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compilation_cache()
    print("backend =", jax.default_backend())

    key = jax.random.PRNGKey(0)
    qs = [jax.random.randint(key, (CIN // 2, COUT), 0, 255, jnp.int32)
          .astype(jnp.uint8) for _ in range(L)]
    gb_u8 = CIN // 2 * COUT * L / 1e9

    # --- sum_pallas: pure stream, block (cin/2, bout)
    for bout in (512, 1024, 3840, 7680, 15360):
        if COUT % bout:
            continue

        def one(q, bout=bout):
            return pl.pallas_call(
                sum_kernel,
                grid=(COUT // bout,),
                in_specs=[pl.BlockSpec((CIN // 2, bout), lambda oo: (0, oo))],
                out_specs=pl.BlockSpec((1, bout), lambda oo: (0, oo)),
                out_shape=jax.ShapeDtypeStruct((1, COUT), jnp.float32),
            )(q)

        @jax.jit
        def run(qs, one=one):
            return sum(one(q).sum() for q in qs)

        try:
            dt = timeit(run, qs)
            report(f"sum_pallas bout={bout}", dt, gb_u8)
        except Exception as e:  # noqa: BLE001
            print(f"  sum_pallas bout={bout} FAILED: {type(e).__name__}"[:120])

    # --- sum_pallas row-blocked 2D grid (smaller blocks, more pipelining)
    for brow, bout in ((1280, 1920), (640, 3840), (1280, 3840), (2560, 1920)):

        def sum2d_kernel(q_ref, o_ref):
            ii = pl.program_id(1)

            @pl.when(ii == 0)
            def _init():
                o_ref[:] = jnp.zeros_like(o_ref)

            o_ref[:] += jnp.sum(q_ref[:].astype(jnp.int32), axis=0,
                                keepdims=True).astype(jnp.float32)

        def one(q, brow=brow, bout=bout):
            return pl.pallas_call(
                sum2d_kernel,
                grid=(COUT // bout, CIN // 2 // brow),
                in_specs=[pl.BlockSpec((brow, bout), lambda oo, ii: (ii, oo))],
                out_specs=pl.BlockSpec((1, bout), lambda oo, ii: (0, oo)),
                out_shape=jax.ShapeDtypeStruct((1, COUT), jnp.float32),
            )(q)

        @jax.jit
        def run(qs, one=one):
            return sum(one(q).sum() for q in qs)

        try:
            dt = timeit(run, qs)
            report(f"sum_pallas 2d {brow}x{bout}", dt, gb_u8)
        except Exception as e:  # noqa: BLE001
            print(f"  sum_pallas 2d {brow}x{bout} FAILED: {type(e).__name__}"[:120])

    # --- sum_xla
    @jax.jit
    def sum_xla(qs):
        return sum(q.astype(jnp.int32).sum() for q in qs)

    dt = timeit(sum_xla, qs)
    report("sum_xla", dt, gb_u8)

    # --- dot_bf16_xla (2x bytes)
    ws = [jax.random.normal(key, (CIN, COUT), jnp.bfloat16) for _ in range(4)]
    x0 = jnp.zeros((1, CIN), jnp.bfloat16)

    @jax.jit
    def dot_chain(x, ws):
        for w in ws:
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            x = y[:, :CIN].astype(jnp.bfloat16)
        return x

    gb_bf16 = CIN * COUT * 2 * len(ws) / 1e9
    dt = timeit(dot_chain, x0, ws)
    report("dot_bf16_xla", dt, gb_bf16)
    del ws

    # --- production qmm with forced bout values
    from supir_tpu.ops import quantize as qz

    ss = [jnp.ones((1, COUT), jnp.float32) for _ in range(L)]
    for bout in (512, 1024, 1920, 3840):
        if COUT % bout:
            continue

        def mm(x, q, s, bout=bout):
            kernel = functools.partial(qz._qmm_kernel, bits=4)
            return pl.pallas_call(
                kernel,
                grid=(COUT // bout,),
                in_specs=[
                    pl.BlockSpec((8, CIN), lambda oo: (0, 0)),
                    pl.BlockSpec((CIN // 2, bout), lambda oo: (0, oo)),
                    pl.BlockSpec((1, bout), lambda oo: (0, oo)),
                ],
                out_specs=pl.BlockSpec((8, bout), lambda oo: (0, oo)),
                out_shape=jax.ShapeDtypeStruct((8, COUT), jnp.float32),
            )(x, q, s)

        @jax.jit
        def chain(x, qs, ss, mm=mm):
            for q, s in zip(qs, ss):
                y = mm(x, q, s)
                x = y[:, :CIN].astype(jnp.bfloat16)
            return x

        x8 = jnp.zeros((8, CIN), jnp.bfloat16)
        try:
            dt = timeit(chain, x8, qs, ss)
            report(f"qmm shiftpair bout={bout}", dt, gb_u8)
        except Exception as e:  # noqa: BLE001
            print(f"  qmm bout={bout} FAILED: {type(e).__name__}: {e}"[:140])


if __name__ == "__main__":
    main()
