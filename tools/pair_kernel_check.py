"""On-chip validation of int4_paired_fused_pair vs the two-launch
composition (int4_paired_fused_matmul x2) at 13B decode shapes.

The pair kernel's phase-2 chunked dot reorders the fp32 accumulation, so
exact bit-equality is not expected — the check bounds the drift against
the inputs' scale. Run before A/B-ing `bench.py --captioner --fused_pairs`.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main():
    from supir_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from supir_tpu.ops.quantize import (
        int4_paired_fused_matmul, int4_paired_fused_pair, quantize_int4_paired,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    ok = True
    # (name, cin1, cout1, cout2, siluglu1) — the two per-layer merges
    for name, cin1, cout1, cout2, sg in (
        ("o+gateup", 5120, 5120, 27648, False),
        ("down+qkv", 13824, 5120, 15360, True),
    ):
        xin = 2 * cin1 if sg else cin1
        x = jnp.asarray(rng.standard_normal((1, xin)) * 0.1, jnp.bfloat16)
        res = jnp.asarray(rng.standard_normal((1, cout1)) * 0.1, jnp.float32)
        gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(cout1), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((cin1, cout1)) * 0.02, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((cout1, cout2)) * 0.02, jnp.float32)
        qp1, sc1 = quantize_int4_paired(w1)
        qp2, sc2 = quantize_int4_paired(w2)

        @jax.jit
        def pair(x, res):
            return int4_paired_fused_pair(
                x, qp1, sc1, res, gamma, qp2, sc2, siluglu1=sg)

        @jax.jit
        def two(x, res):
            sm = int4_paired_fused_matmul(x, qp1, sc1, siluglu=sg, residual=res)
            bg = int4_paired_fused_matmul(
                sm.astype(x.dtype), qp2, sc2, gamma=gamma)
            return sm, bg

        sm_p, bg_p = pair(x, res)
        sm_t, bg_t = two(x, res)
        es = float(jnp.abs(sm_p - sm_t).max())
        eb = float(jnp.abs(bg_p - bg_t).max())
        ss = float(jnp.abs(sm_t).max())
        sb = float(jnp.abs(bg_t).max())
        print(f"{name}: small max|d|={es:.3e} (scale {ss:.2f}), "
              f"big max|d|={eb:.3e} (scale {sb:.2f})", flush=True)
        ok &= es <= 1e-3 * max(ss, 1.0) and eb <= 2e-2 * max(sb, 1.0)
    print("PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
