"""Find the maximum HBM bandwidth achievable by ANY kernel on this chip.

Every variant uses an on-device fori_loop whose body carries a data
dependency on the loop state (not hoistable by LICM), with ONE host
dispatch + ONE device_get per timing — dispatch/sync fully amortized.

  axpy    a = a * c + b          reads a+b, writes a   -> 3N bytes/iter
  triad   c = a + s * b          reads a+b, writes c   -> 3N bytes/iter (rotating)
  read2   acc += (a * b).sum()   reads a+b             -> 2N bytes/iter
  gemv    y = x @ W  (chained)   reads W               -> W bytes/iter

Run: python tools/hbm_peak_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_ITER = 50


def timed(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / N_ITER


def report(name, dt, gbytes):
    print(f"  {name:34s} {dt*1e3:8.3f} ms/iter  {gbytes/dt:5.0f} GB/s "
          f"({gbytes/dt/819*100:3.0f}% of 819)")


def main():
    from supir_tpu.utils.cache import enable_compilation_cache
    from supir_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compilation_cache()
    print("backend =", jax.default_backend(), jax.devices())
    key = jax.random.PRNGKey(0)

    for mb in (64, 256, 1024):
        n = mb * 1024 * 1024 // 2  # bf16 elements
        a = jax.random.normal(key, (n,), jnp.bfloat16)
        b = jax.random.normal(key, (n,), jnp.bfloat16)

        # axpy: a <- a*c + b ; depends on previous a, cannot hoist.
        @jax.jit
        def axpy(a, b):
            def body(i, a):
                return a * jnp.bfloat16(0.999) + b
            return jax.lax.fori_loop(0, N_ITER, body, a)

        dt = timed(axpy, a, b)
        report(f"axpy bf16 {mb}MB (3x bytes)", dt, 3 * n * 2 / 1e9)

        # read2: acc += dot-free product-sum; acc dependency prevents hoist
        # of the accumulate, but (a*b).sum() itself is loop-invariant -> use
        # acc-dependent scaling of a to keep it live.
        @jax.jit
        def read2(a, b):
            def body(i, carry):
                acc, _ = carry
                s = (a * b).astype(jnp.float32).sum() + acc * 1e-9
                return (s, i)
            return jax.lax.fori_loop(0, N_ITER, body, (jnp.float32(0), 0))

        dt = timed(read2, a, b)
        report(f"read2 bf16 {mb}MB (2x bytes)", dt, 2 * n * 2 / 1e9)
        del a, b

    # gemv: chained over 8 distinct big weights, batch 8
    CIN, COUT, L = 5120, 15360, 8
    ws = [jax.random.normal(jax.random.fold_in(key, i), (CIN, COUT),
                            jnp.bfloat16) for i in range(L)]
    x0 = jnp.ones((8, CIN), jnp.bfloat16)

    @jax.jit
    def gemv_chain(x, ws):
        def body(i, x):
            for w in ws:
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                x = y[:, :CIN].astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
            return x
        return jax.lax.fori_loop(0, N_ITER, body, x)

    dt = timed(gemv_chain, x0, ws)
    report(f"gemv bf16 x{L} chained", dt, CIN * COUT * 2 * L / 1e9)

    # gemm: batch 256 (MXU-bound check: should be fast if chip is healthy)
    xb = jnp.ones((256, CIN), jnp.bfloat16)

    @jax.jit
    def gemm_chain(x, ws):
        def body(i, x):
            for w in ws:
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                x = y[:, :CIN].astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
            return x
        return jax.lax.fori_loop(0, N_ITER, body, x)

    dt = timed(gemm_chain, xb, ws)
    fl = 2 * 256 * CIN * COUT * L / 1e12
    print(f"  gemm b256 x{L}: {dt*1e3:8.3f} ms/iter  {fl/dt:6.1f} TF/s "
          f"({fl/dt/197*100:3.0f}% of 197 TF peak)")


if __name__ == "__main__":
    main()
