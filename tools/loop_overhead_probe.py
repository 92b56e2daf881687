"""Isolate XLA on-device loop-iteration overhead on the tunneled TPU.

hbm_peak_probe's axpy ladder fits time(iter) = a + bytes/BW with
a ~ 0.2-0.4 ms — absurdly high for an on-device while-loop iteration.
This probe separates: (1) empty-body fori_loop cost per iteration,
(2) tiny-body cost, (3) axpy at fixed bytes with N_ITER in {10,50,200}
(if 'a' is per-iteration it shows in all three; if it's per-dispatch
it vanishes at high N).

Run: python tools/loop_overhead_probe.py
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
    key = jax.random.PRNGKey(0)

    # 1/2: fori_loop with scalar body, N iterations, one dispatch
    for n in (100, 1000, 10000):
        @jax.jit
        def f(x, n=n):
            return jax.lax.fori_loop(
                0, n, lambda i, x: x * jnp.float32(0.9999) + 1e-6, x)

        x = jnp.float32(1.0)
        jax.device_get(f(x))
        t0 = time.perf_counter()
        jax.device_get(f(x))
        dt = time.perf_counter() - t0
        print(f"  scalar fori x{n:6d}: {dt*1e3:9.3f} ms total "
              f"{dt/n*1e6:8.2f} us/iter")

    # 3: axpy 64MB with varying N_ITER
    n_el = 64 * 1024 * 1024 // 2
    a = jax.random.normal(key, (n_el,), jnp.bfloat16)
    b = jax.random.normal(key, (n_el,), jnp.bfloat16)
    for n in (10, 50, 200):
        @jax.jit
        def axpy(a, b, n=n):
            return jax.lax.fori_loop(
                0, n, lambda i, a: a * jnp.bfloat16(0.999) + b, a)

        out = axpy(a, b)
        jax.device_get(out.ravel()[0])
        t0 = time.perf_counter()
        out = axpy(a, b)
        jax.device_get(out.ravel()[0])
        dt = (time.perf_counter() - t0) / n
        gb = 3 * n_el * 2 / 1e9
        print(f"  axpy 64MB fori x{n:4d}: {dt*1e3:8.3f} ms/iter "
              f"{gb/dt:5.0f} GB/s")

    # 4: same axpy body via lax.scan (what decode uses) — scan carries
    # per-iteration outputs; compare overhead vs fori_loop
    for n in (50,):
        @jax.jit
        def axpy_scan(a, b, n=n):
            def body(a, _):
                return a * jnp.bfloat16(0.999) + b, ()
            out, _ = jax.lax.scan(body, a, None, length=n)
            return out

        out = axpy_scan(a, b)
        jax.device_get(out.ravel()[0])
        t0 = time.perf_counter()
        out = axpy_scan(a, b)
        jax.device_get(out.ravel()[0])
        dt = (time.perf_counter() - t0) / n
        gb = 3 * n_el * 2 / 1e9
        print(f"  axpy 64MB scan x{n:4d}: {dt*1e3:8.3f} ms/iter "
              f"{gb/dt:5.0f} GB/s")


if __name__ == "__main__":
    main()
