"""Probe: can Mosaic consume native jnp.int4 weight blocks directly?

If (a) XLA stores int4 bit-packed in HBM and (b) Mosaic legalizes an
int4 VMEM block + int4->bf16 cast, then the decode GEMV can drop the
manual half-split nibble unpack entirely — the dequant becomes one cast,
and the VPU cost that currently bounds int4 decode (~12.7B nibble ops
per token at 13B dims) mostly disappears.

Stages:
  1. device-size check of an int4 buffer (memory_analysis on a jitted fn)
  2. Mosaic legality: tiny pallas kernel casting an int4 block to bf16
  3. chained GEMV timing: native-int4 kernel vs the packed-uint8 kernel
     at 13B down_proj dims ([1,13824] x [13824,5120])

Run on the real TPU: python tools/int4_native_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def stage1_packing():
    @jax.jit
    def f(x):
        return x.astype(jnp.bfloat16).sum()

    x = jnp.zeros((4096, 4096), jnp.int4)
    mem = jax.jit(lambda v: v + jnp.int4(0)).lower(x).compile().memory_analysis()
    print("stage1: int4 4096x4096 (16.8M elems)")
    print("  argument_size_in_bytes:", getattr(mem, "argument_size_in_bytes", None))
    # packed => ~8.4 MB; byte-backed => ~16.8 MB


def stage2_mosaic():
    def k(a_ref, o_ref):
        o_ref[:] = a_ref[:].astype(jnp.bfloat16) * 2.0

    a = (jnp.arange(128 * 128, dtype=jnp.int8).reshape(128, 128) % 7).astype(jnp.int4)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.bfloat16)
    )(a)
    ok = np.allclose(np.asarray(out[:2, :8], np.float32),
                     np.asarray(a[:2, :8], np.float32) * 2.0)
    print("stage2: mosaic int4 block -> bf16 cast:", "OK" if ok else "MISMATCH")


def _native_kernel(x_ref, q_ref, s_ref, o_ref):
    qb = q_ref[:].astype(x_ref.dtype)  # int4 -> bf16, one cast
    acc = jax.lax.dot_general(
        x_ref[:], qb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = acc * s_ref[:].astype(jnp.float32)


def native_int4_matmul(x, q, scale, bout=256):
    cin, cout = q.shape
    b = x.shape[0]
    bpad = (-b) % 8
    xb = jnp.pad(x, ((0, bpad), (0, 0))) if bpad else x
    out = pl.pallas_call(
        _native_kernel,
        grid=(cout // bout,),
        in_specs=[
            pl.BlockSpec((xb.shape[0], cin), lambda oo: (0, 0)),
            pl.BlockSpec((cin, bout), lambda oo: (0, oo)),
            pl.BlockSpec((1, bout), lambda oo: (0, oo)),
        ],
        out_specs=pl.BlockSpec((xb.shape[0], bout), lambda oo: (0, oo)),
        out_shape=jax.ShapeDtypeStruct((xb.shape[0], cout), jnp.float32),
    )(xb, q, scale)
    return out[:b]


def stage3_timing(iters=50):
    from supir_tpu.ops.quantize import _qmm, quantize_int4

    cin, cout = 13824, 5120
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (cin, cout), jnp.float32) * 0.02
    x = jax.random.normal(key, (1, cin), jnp.bfloat16)
    packed, scale = quantize_int4(w)
    packed, scale = jax.device_put(packed), jax.device_put(scale)
    qn = jnp.clip(jnp.round(w / jnp.maximum(jnp.abs(w).max(0, keepdims=True) / 7.0, 1e-12)),
                  -7, 7).astype(jnp.int4)

    def make_chain(gemv):
        @jax.jit
        def chain(x):
            y = x
            last = None
            for _ in range(8):
                o = gemv(y)  # [1, cout]
                # thread a non-foldable dependency so the 8 calls serialize
                # and can't CSE (o is data-dependent on the previous call)
                y = x * (1.0 + o[:, :1].astype(jnp.bfloat16) * 1e-12)
                last = o
            return last

        return chain

    chain_packed = make_chain(lambda y: _qmm(y, packed, scale, bits=4))
    chain_native = make_chain(lambda y: native_int4_matmul(y, qn, scale))
    # plain XLA: convert(int4->bf16) should fuse into the dot and stream
    # the packed buffer directly — no custom kernel at all
    chain_xla = make_chain(
        lambda y: jnp.dot(y, qn.astype(y.dtype),
                          preferred_element_type=jnp.float32) * scale
    )

    for name, fn in [("packed-uint8", chain_packed),
                     ("native-int4", chain_native),
                     ("xla-int4-dot", chain_xla)]:
        try:
            fn(x).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(x)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / iters / 8
            gb = cin * cout * 0.5 / 1e9
            print(f"stage3 {name}: {dt*1e3:.3f} ms/gemv -> {gb/dt:.0f} GB/s effective")
        except Exception as e:
            print(f"stage3 {name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for st in (stage1_packing, stage2_mosaic, stage3_timing):
        try:
            st()
        except Exception as e:
            print(f"{st.__name__} FAILED: {type(e).__name__}: {str(e)[:300]}")
    os._exit(0)
