"""Is lax.scan over stacked weights copying each weight slice before the
pallas GEMV call?  Compare per-GEMV time, same kernel, three harnesses:

  unroll — python loop inside jit, L weights as separate jit args
  scan   — lax.scan over the stacked [L, ...] tree (the decode's shape)
  scan_noslice — scan with the weight captured per-iteration via
                 lax.switch on index (forces no xs-slicing; same traffic)

Run: python tools/scan_vs_unroll.py [--L 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(f, *args, reps=20, warm=2):
    for _ in range(warm):
        out = f(*args)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.device_get(out.ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=8)
    args = ap.parse_args()

    from supir_tpu.ops.quantize import int4_matmul
    from supir_tpu.utils.cache import enable_compilation_cache
    from supir_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compilation_cache()
    print("backend =", jax.default_backend())

    L = args.L
    cin, cout = 5120, 15360
    key = jax.random.PRNGKey(0)
    stacked_q = jax.random.randint(key, (L, cin // 2, cout), 0, 255,
                                   jnp.int32).astype(jnp.uint8)
    stacked_s = jnp.ones((L, 1, cout), jnp.float32)
    qs = [stacked_q[i] for i in range(L)]
    ss = [stacked_s[i] for i in range(L)]
    gb = cin * cout * L / 2 / 1e9

    def fold(x, y):
        return y[:, : x.shape[1]].astype(jnp.bfloat16)

    @jax.jit
    def unroll(x, qs, ss):
        for q, s in zip(qs, ss):
            x = fold(x, int4_matmul(x, q, s))
        return x

    @jax.jit
    def scan(x, q, s):
        def body(x, ws):
            return fold(x, int4_matmul(x, ws[0], ws[1])), None
        x, _ = jax.lax.scan(body, x, (q, s))
        return x

    x0 = jnp.zeros((1, cin), jnp.bfloat16)
    dt = timeit(unroll, x0, qs, ss)
    print(f"  unroll {dt/L*1e3:7.3f} ms/gemv  {gb/dt:5.0f} GB/s ({gb/dt/819*100:3.0f}%)")
    dt = timeit(scan, x0, stacked_q, stacked_s)
    print(f"  scan   {dt/L*1e3:7.3f} ms/gemv  {gb/dt:5.0f} GB/s ({gb/dt/819*100:3.0f}%)")


if __name__ == "__main__":
    main()
