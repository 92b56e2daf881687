"""Quantify host-sync and dispatch overhead through the tunneled TPU, and
re-measure streaming rates with on-device fori_loop repetition so one
dispatch covers many kernel iterations (sync cost amortized to nothing).

Run: python tools/sync_cost_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from supir_tpu.utils.cache import enable_compilation_cache
    from supir_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compilation_cache()
    print("backend =", jax.default_backend())

    # --- 1. raw sync cost: device_get of a single scalar, repeated
    x = jnp.zeros((1,), jnp.float32)
    jax.device_get(x)
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(x)
        print(f"  device_get scalar: {(time.perf_counter()-t0)*1e3:8.3f} ms")

    # --- 2. dispatch cost: trivial jitted op, timed over 100 reps, 1 sync
    f = jax.jit(lambda x: x + 1)
    y = f(x)
    jax.device_get(y)
    t0 = time.perf_counter()
    for _ in range(100):
        y = f(y)
    jax.device_get(y)
    print(f"  dispatch+chain x100 trivial: {(time.perf_counter()-t0)*1e3:8.3f} ms total")

    # --- 3. bf16 GEMV rate with on-device fori_loop (N iters in ONE dispatch)
    CIN, COUT = 5120, 15360
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (CIN, COUT), jnp.bfloat16)
    x0 = jnp.ones((8, CIN), jnp.bfloat16)
    N = 100

    @jax.jit
    def loop(x, w):
        def body(i, x):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return y[:, :CIN].astype(jnp.bfloat16) + x * 1e-6
        return jax.lax.fori_loop(0, N, body, x)

    out = loop(x0, w)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    out = loop(x0, w)
    jax.device_get(out.ravel()[0])
    dt = (time.perf_counter() - t0) / N
    gb = CIN * COUT * 2 / 1e9
    print(f"  dot_bf16 fori x{N}: {dt*1e3:8.3f} ms/iter  {gb/dt:5.0f} GB/s ({gb/dt/819*100:3.0f}%)")

    # --- 4. u8 sum rate with fori_loop
    q = jax.random.randint(key, (CIN // 2, COUT), 0, 255, jnp.int32).astype(jnp.uint8)

    @jax.jit
    def sumloop(q):
        def body(i, acc):
            return acc + q.astype(jnp.int32).sum(dtype=jnp.int32)
        return jax.lax.fori_loop(0, N, body, jnp.int32(0))

    out = sumloop(q)
    jax.device_get(out)
    t0 = time.perf_counter()
    out = sumloop(q)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / N
    gb = CIN // 2 * COUT / 1e9
    print(f"  sum_u8 fori x{N}:  {dt*1e3:8.3f} ms/iter  {gb/dt:5.0f} GB/s ({gb/dt/819*100:3.0f}%)")

    # --- 5. bf16 copy (pure HBM read+write) with fori_loop
    big = jax.random.normal(key, (4096, 8192), jnp.bfloat16)  # 64 MB

    @jax.jit
    def copyloop(b):
        def body(i, acc):
            return acc * 0.999999 + b.astype(jnp.float32).sum(dtype=jnp.float32)
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    out = copyloop(big)
    jax.device_get(out)
    t0 = time.perf_counter()
    out = copyloop(big)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / N
    gb = big.size * 2 / 1e9
    print(f"  sum_bf16 fori x{N}: {dt*1e3:7.3f} ms/iter  {gb/dt:5.0f} GB/s ({gb/dt/819*100:3.0f}%)")


if __name__ == "__main__":
    main()
