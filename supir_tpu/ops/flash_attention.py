"""Pallas TPU flash attention (blockwise online-softmax).

Replaces the reference's attention backend zoo — xformers
`memory_efficient_attention` (sgm/modules/attention.py:357), torch SDPA
(:275), and the Triton flash kernel
(llava/.../mpt/flash_attn_triton.py:51-497) — with one TPU kernel.

Shapes: q [B, S, H, D], k/v [B, T, H, D] -> [B, S, H, D].

Kernel structure: grid (B*H, n_q_blocks, n_kv_blocks); TPU executes the
minor-most grid dim sequentially per core, so fp32 scratch (running max m,
normalizer l, accumulator acc) carries across kv blocks of one q block.
The softmax is never materialized at [S, T]; HBM traffic is O(S*D + T*D).

Supports optional causal masking (for the captioner's autoregressive
decoder) and ragged kv lengths via trailing-block masking. Falls back to
interpret mode off-TPU so CPU tests exercise the same code path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = math.log2(math.e)


def _attn_kernel_packed(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, scale, kv_len, bq, bkv, d, gsize, causal, ragged
):
    """Head-group-packed flash attention tile.

    Blocks are [bq, gsize*d] slices of a [B, S, H*D] array — the natural
    Dense-output layout, so no [B,S,H,D]->[B*H,S,D] transposes ever
    materialize. With d=64 two heads ride one 128-lane block, filling the
    VMEM tile that a lone 64-wide head would leave half empty.

    VPU cost per tile is minimized by static specialization: tiles that
    need no mask (interior blocks — the entire UNet self-attention case)
    skip the iota/compare/select entirely, the softmax runs exp2 with the
    scale folded into the exponent multiplier, and the running max is
    tracked in raw-score units.
    """
    kv_i = pl.program_id(2)
    n_kv = pl.num_programs(2)
    q_i = pl.program_id(1)
    c = scale * LOG2E

    @pl.when(kv_i == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def compute(masked):
        if masked:
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + kv_i * bkv
            )
            mask = col < kv_len
            if causal:
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
                    + q_i * bq
                )
                mask = mask & (col <= row)
        for g in range(gsize):
            sl = slice(g * d, (g + 1) * d)
            s = jax.lax.dot_general(
                q_ref[0][:, sl], k_ref[0][:, sl],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [bq, bkv], raw (unscaled) scores
            if masked:
                s = jnp.where(mask, s, NEG_INF)
            m_prev = m_scr[:, g * d : g * d + 1]  # [bq, 1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp2((s - m_new) * c)
            corr = jnp.exp2((m_prev - m_new) * c)  # [bq, 1]
            l_new = l_scr[:, g * d : g * d + 1] * corr + jnp.sum(
                p, axis=1, keepdims=True
            )
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0][:, sl],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            acc_scr[:, sl] = acc_scr[:, sl] * corr + pv
            m_scr[:, sl] = jnp.broadcast_to(m_new, (bq, d))
            l_scr[:, sl] = jnp.broadcast_to(l_new, (bq, d))

    last = kv_i == n_kv - 1
    if causal:
        # fully-above-diagonal blocks are skipped; partial-overlap blocks
        # (and a ragged last block) take the masked path
        above = kv_i * bkv > q_i * bq + bq - 1
        full = kv_i * bkv + bkv - 1 <= q_i * bq
        if ragged:
            full = full & jnp.logical_not(last)
        pl.when(jnp.logical_not(above) & full)(lambda: compute(False))
        pl.when(jnp.logical_not(above) & jnp.logical_not(full))(
            lambda: compute(True)
        )
    elif ragged:
        pl.when(jnp.logical_not(last))(lambda: compute(False))
        pl.when(last)(lambda: compute(True))
    else:
        compute(False)

    @pl.when(last)
    def _():
        norm = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / norm).astype(o_ref.dtype)


def _attn_kernel_packed_single(
    q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, bq, bkv, d, gsize, causal,
    ragged,
):
    """One-kv-block specialization of `_attn_kernel_packed`.

    When the whole key range fits a single kv block (every 1024-token UNet
    self-attention site at the default bkv, and the captioner prefill),
    the online-softmax machinery is pure overhead: no scratch init pass, no
    running-max correction rescale of the accumulator, no m/l broadcasts,
    no separate final normalize pass. The softmax is computed closed-form
    per tile and the output written once. Saves ~4 [bq, *] VPU passes per
    tile vs the general kernel.
    """
    q_i = pl.program_id(1)
    c = scale * LOG2E
    need_mask = ragged or causal
    if need_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
        mask = col < kv_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + q_i * bq
            mask = mask & (col <= row)
    for g in range(gsize):
        sl = slice(g * d, (g + 1) * d)
        s = jax.lax.dot_general(
            q_ref[0][:, sl], k_ref[0][:, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if need_mask:
            s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2((s - m) * c)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0][:, sl],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (pv / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _attn_kernel(
    *refs, scale, kv_len, bkv, causal, bq, alibi, with_lse=False
):
    idx = 3
    q_ref, k_ref, v_ref = refs[:3]
    slope_ref = refs[idx] if alibi else None
    idx += 1 if alibi else 0
    o_ref = refs[idx]
    idx += 1
    lse_ref = refs[idx] if with_lse else None
    idx += 1 if with_lse else 0
    m_scr, l_scr, acc_scr = refs[idx : idx + 3]
    kv_i = pl.program_id(2)
    n_kv = pl.num_programs(2)
    q_i = pl.program_id(1)
    # read at top level: program_id is unavailable inside pl.when bodies in
    # interpret mode
    slope = slope_ref[pl.program_id(0)] if alibi else None

    @pl.when(kv_i == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def compute():
        q = q_ref[0]  # [bq, D]
        k = k_ref[0]  # [bkv, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale  # [bq, bkv]

        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_i * bkv
        if alibi:
            # MPT column-convention ALiBi: slope * (col - (kv_len-1)); the
            # per-row constant offset cancels in softmax (attention.py:292)
            s = s + slope * (col - (kv_len - 1)).astype(jnp.float32)
        mask = col < kv_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_i * bq
            mask = mask & (col <= row)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, 0:1]  # [bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [bq, bkv]
        corr = jnp.exp(m_prev - m_new)  # [bq, 1]
        l_new = l_scr[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    if causal:
        # skip kv blocks entirely above the diagonal
        @pl.when(kv_i * bkv <= (q_i + 1) * bq - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(kv_i == n_kv - 1)
    def _():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:, 0:1], 1e-30)).astype(o_ref.dtype)
        if with_lse:
            # per-row logsumexp of the SCALED (+bias) scores — the backward
            # residual (reference keeps the same L tensor,
            # flash_attn_triton.py:128-151). Stored lane-broadcast
            # [bq, 128]: m/l scratch already hold that layout, and Mosaic
            # rejects (1, bq) output blocks (last-two-dims 8x128 rule)
            lse_ref[0] = m_scr[:] + jnp.log(jnp.maximum(l_scr[:], 1e-30))


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(
    q, k, v, bias=None, causal=False, alibi_slopes=None,
    bq: int | None = None, bkv: int | None = None,
    interpret: bool | None = None,
):
    """[B, S, H, D] attention; scale = D**-0.5. `alibi_slopes` [H] fuses the
    MPT ALiBi column bias into the kernel (replacing the reference's Triton
    bias path, flash_attn_triton.py:51-497). Arbitrary dense `bias` is not
    supported in the kernel path (UNet/CLIP never need it) — falls back to
    XLA if given.

    Differentiable: under `jax.grad` a custom VJP runs an lse-emitting
    forward plus blockwise Pallas dQ/dKV backward kernels (the reference's
    Triton kernel is likewise fwd+bwd, flash_attn_triton.py:155-299), so
    training keeps flash's O(S*D) memory instead of materializing [S, T]
    probabilities."""
    if bias is not None:
        from supir_tpu.ops.attention import _xla_attention

        return _xla_attention(q, k, v, bias=bias, causal=causal)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, s, h, d = q.shape
    t = k.shape[1]
    bq, bkv = _resolve_blocks(s, t, bq, bkv)
    slopes = (
        tuple(float(x) for x in np.asarray(alibi_slopes))
        if alibi_slopes is not None else None
    )
    fn = _make_diff_fn(causal, slopes, bq, bkv, interpret)
    return fn(q, k, v)


def _resolve_blocks(s, t, bq, bkv):
    # block defaults from v5e sweeps (head-packed kernel): long kv wants a
    # deep kv pipeline — (512,2048) hits 48 TF/s at 4096 tokens (vs 38 at
    # (1024,1024)); at 1024 tokens (512,1024) ~12 TF/s, launch-bound
    if bq is None or bkv is None:
        import os

        if bq is None:
            bq = int(os.environ.get("SUPIR_FLASH_BQ", "0")) or 512
        if bkv is None:
            bkv = int(os.environ.get("SUPIR_FLASH_BKV", "0")) or (
                2048 if t >= 2048 else 1024
            )
    bq = min(bq, max(8, 1 << (s - 1).bit_length()))
    bkv = min(bkv, max(128, 1 << (t - 1).bit_length()))
    return bq, bkv


@functools.lru_cache(maxsize=None)
def _make_diff_fn(causal, slopes, bq, bkv, interpret):
    """custom_vjp closure per static config: primal = the fast inference
    dispatch (head-packed when eligible); fwd rule = lse-emitting kernel;
    bwd rule = blockwise dQ / dKV kernels."""

    @jax.custom_vjp
    def fn(q, k, v):
        return _flash_primal(q, k, v, causal, slopes, bq, bkv, interpret)

    def fwd(q, k, v):
        out, lse = _flash_fwd_lse(q, k, v, causal, slopes, bq, bkv, interpret)
        return out, (q, k, v, out, lse)

    def bwd(res, g):
        q, k, v, out, lse = res
        return _flash_bwd(q, k, v, out, lse, g, causal, slopes, bq, bkv,
                          interpret)

    fn.defvjp(fwd, bwd)
    return fn


@functools.partial(
    jax.jit, static_argnames=("causal", "alibi_slopes", "bq", "bkv", "interpret")
)
def _flash_primal(q, k, v, causal, alibi_slopes, bq, bkv, interpret):
    b, s, h, d = q.shape
    t = k.shape[1]
    scale = d**-0.5
    alibi = alibi_slopes is not None

    # head-group-packed fast path: no transposes, full 128-lane blocks
    gsize = 128 // d if d in (64, 128) else 0
    if not alibi and gsize and h % gsize == 0:
        hg = h // gsize
        qb = _pad_to(q.reshape(b, s, h * d), 1, bq)
        kb = _pad_to(k.reshape(b, t, h * d), 1, bkv)
        vb = _pad_to(v.reshape(b, t, h * d), 1, bkv)
        s_pad, t_pad = qb.shape[1], kb.shape[1]
        grid = (b * hg, s_pad // bq, t_pad // bkv)
        gd = gsize * d
        if t_pad == bkv:
            kernel = functools.partial(
                _attn_kernel_packed_single, scale=scale, kv_len=t, bq=bq,
                bkv=bkv, d=d, gsize=gsize, causal=causal, ragged=(t_pad != t),
            )
            scratch = []
        else:
            kernel = functools.partial(
                _attn_kernel_packed, scale=scale, kv_len=t, bq=bq, bkv=bkv,
                d=d, gsize=gsize, causal=causal, ragged=(t_pad != t),
            )
            scratch = [
                pltpu.VMEM((bq, gd), jnp.float32),
                pltpu.VMEM((bq, gd), jnp.float32),
                pltpu.VMEM((bq, gd), jnp.float32),
            ]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, gd), lambda g, i, j: (g // hg, i, g % hg)),
                pl.BlockSpec((1, bkv, gd), lambda g, i, j: (g // hg, j, g % hg)),
                pl.BlockSpec((1, bkv, gd), lambda g, i, j: (g // hg, j, g % hg)),
            ],
            out_specs=pl.BlockSpec((1, bq, gd), lambda g, i, j: (g // hg, i, g % hg)),
            out_shape=jax.ShapeDtypeStruct(qb.shape, q.dtype),
            scratch_shapes=scratch,
            interpret=interpret,
        )(qb, kb, vb)
        return out[:, :s].reshape(b, s, h, d)

    # [B, S, H, D] -> [B*H, S, D]
    qb = _pad_to(q.transpose(0, 2, 1, 3).reshape(b * h, s, d), 1, bq)
    kb = _pad_to(k.transpose(0, 2, 1, 3).reshape(b * h, t, d), 1, bkv)
    vb = _pad_to(v.transpose(0, 2, 1, 3).reshape(b * h, t, d), 1, bkv)
    s_pad, t_pad = qb.shape[1], kb.shape[1]
    grid = (b * h, s_pad // bq, t_pad // bkv)

    kernel = functools.partial(
        _attn_kernel, scale=scale, kv_len=t, bkv=bkv, causal=causal, bq=bq,
        alibi=alibi,
    )
    in_specs = [
        pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
        pl.BlockSpec((1, bkv, d), lambda i, j, kk: (i, kk, 0)),
        pl.BlockSpec((1, bkv, d), lambda i, j, kk: (i, kk, 0)),
    ]
    operands = [qb, kb, vb]
    if alibi:
        slopes = jnp.tile(jnp.asarray(alibi_slopes, jnp.float32), b)  # [B*H]
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(slopes)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(qb.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    out = out[:, :s].reshape(b, h, s, d).transpose(0, 2, 1, 3)
    return out


# --------------------------------------------------------------- backward
# Blockwise flash-attention VJP (reference: the Triton kernel's _bwd_kernel,
# llava/.../mpt/flash_attn_triton.py:155-299). Residuals are q/k/v/out plus
# the per-row logsumexp of the scaled scores; the [S, T] probability matrix
# is recomputed tile-by-tile in both backward kernels, never materialized.
# Layout is the plain [B*H, S, D] one (the packed layout would need a
# per-group lse); training throughput is dominated by the dgemms anyway.


def _bh_layout(x, mult):
    b, s, h, d = x.shape
    return _pad_to(x.transpose(0, 2, 1, 3).reshape(b * h, s, d), 1, mult)


@functools.partial(
    jax.jit, static_argnames=("causal", "alibi_slopes", "bq", "bkv", "interpret")
)
def _flash_fwd_lse(q, k, v, causal, alibi_slopes, bq, bkv, interpret):
    b, s, h, d = q.shape
    t = k.shape[1]
    scale = d**-0.5
    alibi = alibi_slopes is not None

    qb = _bh_layout(q, bq)
    kb = _bh_layout(k, bkv)
    vb = _bh_layout(v, bkv)
    s_pad, t_pad = qb.shape[1], kb.shape[1]
    grid = (b * h, s_pad // bq, t_pad // bkv)

    kernel = functools.partial(
        _attn_kernel, scale=scale, kv_len=t, bkv=bkv, causal=causal, bq=bq,
        alibi=alibi, with_lse=True,
    )
    in_specs = [
        pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
        pl.BlockSpec((1, bkv, d), lambda i, j, kk: (i, kk, 0)),
        pl.BlockSpec((1, bkv, d), lambda i, j, kk: (i, kk, 0)),
    ]
    operands = [qb, kb, vb]
    if alibi:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.tile(jnp.asarray(alibi_slopes, jnp.float32), b))
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, bq, 128), lambda i, j, kk: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qb.shape, q.dtype),
            jax.ShapeDtypeStruct((b * h, s_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return out[:, :s].reshape(b, h, s, d).transpose(0, 2, 1, 3), lse


def _bwd_scores(q_ref, k_ref, lse_ref, kv_off, q_off, scale, kv_len, causal,
                alibi, slope):
    """Recompute the probability tile p [bq, bkv] from residuals."""
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [bq, bkv]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_off
    if alibi:
        s = s + slope * (col - (kv_len - 1)).astype(jnp.float32)
    p = jnp.exp(s - lse_ref[0][:, 0:1])  # lse lane-broadcast [bq, 128]
    mask = col < kv_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_off
        mask = mask & (col <= row)
    return jnp.where(mask, p, 0.0)


def _bwd_dq_kernel(*refs, scale, kv_len, bq, bkv, causal, alibi):
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[:6]
    slope_ref = refs[6] if alibi else None
    o = 7 if alibi else 6
    dq_ref = refs[o]
    dq_scr = refs[o + 1]
    kv_i = pl.program_id(2)
    n_kv = pl.num_programs(2)
    q_i = pl.program_id(1)
    slope = slope_ref[pl.program_id(0)] if alibi else None

    @pl.when(kv_i == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    def compute():
        p = _bwd_scores(q_ref, k_ref, lse_ref, kv_i * bkv, q_i * bq, scale,
                        kv_len, causal, alibi, slope)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bkv]
        ds = p * (dp - delta_ref[0][:, 0:1])
        dq_scr[:] += scale * jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        @pl.when(kv_i * bkv <= (q_i + 1) * bq - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(kv_i == n_kv - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(*refs, scale, kv_len, bq, bkv, causal, alibi):
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[:6]
    slope_ref = refs[6] if alibi else None
    o = 7 if alibi else 6
    dk_ref, dv_ref = refs[o : o + 2]
    dk_scr, dv_scr = refs[o + 2 : o + 4]
    kv_i = pl.program_id(1)
    q_i = pl.program_id(2)
    n_q = pl.num_programs(2)
    slope = slope_ref[pl.program_id(0)] if alibi else None

    @pl.when(q_i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    def compute():
        # same [bq, bkv] tile orientation as the dq kernel (the lse/delta
        # residuals broadcast as [bq, 1] columns); dk/dv contract over the
        # bq dim directly — dim-0 contractions stay on the MXU, no
        # in-kernel transposes
        p = _bwd_scores(q_ref, k_ref, lse_ref, kv_i * bkv, q_i * bq, scale,
                        kv_len, causal, alibi, slope)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bkv, d]
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bkv]
        ds = p * (dp - delta_ref[0][:, 0:1])
        dk_scr[:] += scale * jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bkv, d]

    if causal:
        @pl.when(kv_i * bkv <= (q_i + 1) * bq - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(q_i == n_q - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "alibi_slopes", "bq", "bkv", "interpret")
)
def _flash_bwd(q, k, v, out, lse, g, causal, alibi_slopes, bq, bkv, interpret):
    b, s, h, d = q.shape
    t = k.shape[1]
    scale = d**-0.5
    alibi = alibi_slopes is not None

    qb = _bh_layout(q, bq)
    kb = _bh_layout(k, bkv)
    vb = _bh_layout(v, bkv)
    dob = _bh_layout(g, bq)
    ob = _bh_layout(out, bq)
    s_pad, t_pad = qb.shape[1], kb.shape[1]
    # delta_i = sum_d dO_i * O_i — cheap elementwise reduce, XLA fuses it;
    # padded rows give 0, which zeroes their ds contribution in-kernel.
    # Lane-broadcast to [BH, S, 128] to match the lse layout (Mosaic's
    # last-two-dims 8x128 block rule forbids (1, bq) blocks)
    delta = jnp.sum(dob.astype(jnp.float32) * ob.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], delta.shape + (128,))

    qkv_specs = [
        pl.BlockSpec((1, bq, d), None),    # q — index_map set per kernel
        pl.BlockSpec((1, bkv, d), None),   # k
        pl.BlockSpec((1, bkv, d), None),   # v
        pl.BlockSpec((1, bq, d), None),    # do
        pl.BlockSpec((1, bq, 128), None),  # lse (lane-broadcast)
        pl.BlockSpec((1, bq, 128), None),  # delta (lane-broadcast)
    ]
    operands = [qb, kb, vb, dob, lse, delta]
    if alibi:
        qkv_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.tile(jnp.asarray(alibi_slopes, jnp.float32), b))

    # dQ: grid (BH, n_q, n_kv) — kv is the sequential accumulation axis
    dq_maps = [
        lambda i, j, kk: (i, j, 0),   # q
        lambda i, j, kk: (i, kk, 0),  # k
        lambda i, j, kk: (i, kk, 0),  # v
        lambda i, j, kk: (i, j, 0),   # do
        lambda i, j, kk: (i, j, 0),   # lse
        lambda i, j, kk: (i, j, 0),   # delta
    ]
    dq_specs = [
        pl.BlockSpec(sp.block_shape, m) if sp.block_shape else sp
        for sp, m in zip(qkv_specs, dq_maps + [None] * alibi)
    ]
    dqb = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, kv_len=t, bq=bq, bkv=bkv,
            causal=causal, alibi=alibi,
        ),
        grid=(b * h, s_pad // bq, t_pad // bkv),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(qb.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(*operands)

    # dK/dV: grid (BH, n_kv, n_q) — q is the sequential accumulation axis
    dkv_maps = [
        lambda i, j, kk: (i, kk, 0),  # q
        lambda i, j, kk: (i, j, 0),   # k
        lambda i, j, kk: (i, j, 0),   # v
        lambda i, j, kk: (i, kk, 0),  # do
        lambda i, j, kk: (i, kk, 0),  # lse
        lambda i, j, kk: (i, kk, 0),  # delta
    ]
    dkv_specs = [
        pl.BlockSpec(sp.block_shape, m) if sp.block_shape else sp
        for sp, m in zip(qkv_specs, dkv_maps + [None] * alibi)
    ]
    dkb, dvb = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, kv_len=t, bq=bq, bkv=bkv,
            causal=causal, alibi=alibi,
        ),
        grid=(b * h, t_pad // bkv, s_pad // bq),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, bkv, d), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, bkv, d), lambda i, j, kk: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(kb.shape, k.dtype),
            jax.ShapeDtypeStruct(vb.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, d), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    unpack_q = lambda x: x[:, :s].reshape(b, h, s, d).transpose(0, 2, 1, 3)
    unpack_kv = lambda x: x[:, :t].reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return unpack_q(dqb), unpack_kv(dkb), unpack_kv(dvb)
