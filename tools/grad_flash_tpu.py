"""Compiled (real-TPU) verification of the flash-attention backward.

Runs jax.grad through `dot_product_attention` with the flash path selected
at the exact site a full-width train step hits (latent 128^2 -> S=4096
self-attention, d=64 heads), compares against the XLA path, and times both.
This is the on-hardware counterpart of tests/test_flash_attention_bwd.py
(interpret mode); VERDICT r4 flagged that nothing proved the TPU train
step could differentiate the auto-dispatched kernel.

Usage: python tools/grad_flash_tpu.py [--seq 4096] [--heads 8] [--dim 64]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import time


def main():
    from supir_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    b, s, h, d = args.batch, args.seq, args.heads, args.dim
    print(f"backend={jax.default_backend()} shape=[{b},{s},{h},{d}]", flush=True)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(k1, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(k2, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(k3, (b, s, h, d), jnp.bfloat16)
    g = jax.random.normal(k4, (b, s, h, d), jnp.bfloat16)

    def make_loss(impl):
        from supir_tpu.ops.attention import dot_product_attention

        def loss(q, k, v):
            out = dot_product_attention(q, k, v, impl=impl)
            return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    results = {}
    for impl in ("flash", "xla"):
        fn = make_loss(impl)
        t0 = time.perf_counter()
        grads = fn(q, k, v)
        jax.device_get(grads[0][0, 0, 0, 0])  # axon: block_until_ready no-op
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            grads = fn(q, k, v)
        jax.device_get(grads[0][0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / n
        results[impl] = (grads, dt)
        print(f"{impl}: {dt*1e3:.2f} ms/grad-step (compile {compile_s:.1f}s)",
              flush=True)

    gf, gx = results["flash"][0], results["xla"][0]
    ok = True
    for name, a, bb in zip("qkv", gf, gx):
        err = float(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32)).max())
        print(f"d{name} max|flash-xla| = {err:.3e}", flush=True)
        ok &= err < 0.125  # bf16 inputs: one-ulp-scale disagreement allowed

    # causal + ALiBi at S=2048: the captioner-training kernel variant
    # (MPT prefill under grad) — different fwd path (non-packed + SMEM
    # slopes) and masked backward tiles
    from supir_tpu.ops.attention import dot_product_attention

    s2 = min(2048, s)
    qc, kc, vc = (x[:, :s2] for x in (q, k, v))
    gc = g[:, :s2]
    slopes = tuple(2.0 ** (-(i + 1)) for i in range(h))

    def make_causal(impl):
        def loss(q, k, v):
            out = dot_product_attention(q, k, v, causal=True, impl=impl,
                                        alibi_slopes=slopes)
            return jnp.sum(out.astype(jnp.float32) * gc.astype(jnp.float32))

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    gfc = make_causal("flash")(qc, kc, vc)
    gxc = make_causal("xla")(qc, kc, vc)
    jax.device_get(gfc[0][0, 0, 0, 0])
    for name, a, bb in zip("qkv", gfc, gxc):
        err = float(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32)).max())
        print(f"causal+alibi d{name} max|flash-xla| = {err:.3e}", flush=True)
        ok &= err < 0.125
    print("PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
