"""Ring attention: sequence-sharded attention over a mesh axis.

SURVEY.md section 5 (long-context): SUPIR's "context" axis is spatial
resolution. When even one tile's tokens exceed a chip (8K+ imagery), the
sequence itself must shard. Here q/k/v are sharded over a mesh axis; each
device keeps its q shard and the k/v shards rotate around the ring via
`lax.ppermute` while an online-softmax accumulator (the same math as the
flash kernel, at shard granularity) merges partial results. Collectives
ride ICI; peak memory per chip is O(S/N * D).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _local_attn_stats(q, k, v, scale):
    """Returns (out_unnorm, row_max, row_sum) for one k/v block.

    q [B,S,H,D], k/v [B,T,H,D]; fp32 stats."""
    logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    m = jnp.max(logits, axis=-1, keepdims=True)              # [B,H,S,1]
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)                   # [B,H,S,1]
    o = jnp.einsum("bhst,bthd->bshd", p.astype(v.dtype), v)  # [B,S,H,D]
    return o.astype(jnp.float32), m, l


def ring_attention(q, k, v, mesh: Mesh, axis: str = "tile"):
    """Attention with q/k/v sharded on sequence over `axis`.

    q, k, v: [B, S, H, D] global arrays (sharded or shardable); S must be
    divisible by the axis size. Returns [B, S, H, D].
    """
    n = mesh.shape[axis]
    scale = q.shape[-1] ** -0.5

    def local(qc, kc, vc):
        # qc/kc/vc: local shards [B, S/n, H, D]
        def step(i, carry):
            o_acc, m_acc, l_acc, k_cur, v_cur = carry
            o_i, m_i, l_i = _local_attn_stats(qc, k_cur, v_cur, scale)
            m_new = jnp.maximum(m_acc, m_i)
            c_old = jnp.exp(m_acc - m_new)
            c_new = jnp.exp(m_i - m_new)
            # o accumulators are [B,S,H,D]; stats [B,H,S,1] -> align axes
            co = jnp.swapaxes(c_old, 1, 2)  # [B,S,H,1]
            cn = jnp.swapaxes(c_new, 1, 2)
            o_acc = o_acc * co + o_i * cn
            l_acc = l_acc * c_old + l_i * c_new
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            return o_acc, m_new, l_acc, k_nxt, v_nxt

        b, s_loc, h, d = qc.shape
        o0 = jnp.zeros((b, s_loc, h, d), jnp.float32)
        m0 = jnp.full((b, h, s_loc, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, h, s_loc, 1), jnp.float32)
        o, m, l, _, _ = jax.lax.fori_loop(0, n, step, (o0, m0, l0, kc, vc))
        out = o / jnp.swapaxes(jnp.maximum(l, 1e-30), 1, 2)
        return out.astype(qc.dtype)

    spec = P(None, axis, None, None)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
