"""Int8 weight quantization (Pallas) — the TPU stand-in for the
reference's bitsandbytes 8-bit LLaVA loading (llava/model/builder.py:29-38).

Per-channel symmetric int8: w ~ scale[c] * q[c], quantized with stochastic
rounding on-device; matmul dequantizes on the fly (int8 weights halve HBM
traffic for the memory-bound decode of the 13B captioner).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_kernel(w_ref, seed_ref, q_ref, scale_ref):
    pltpu.prng_seed(seed_ref[0])
    w = w_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)  # per out-channel
    scale = absmax / 127.0
    scaled = w / jnp.maximum(scale, 1e-12)
    # manual stochastic rounding (pltpu.stochastic_round targets only
    # bf16/fp8 on this generation): floor(x + u), u ~ U[0,1)
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # Mosaic can't cast uint32->f32 directly; go through int32 (>>8 makes it
    # non-negative so the signed cast is exact)
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    q = jnp.clip(jnp.floor(scaled + u), -127.0, 127.0)
    q_ref[:] = q.astype(jnp.int8)
    scale_ref[:] = scale


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_int8(w: jnp.ndarray, seed: int = 0, interpret: bool | None = None):
    """w [in, out] -> (q int8 [in, out], scale fp32 [1, out])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        # interpret-mode fallback without TPU PRNG: round-to-nearest
        absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
        scale = absmax / 127.0
        q = jnp.clip(jnp.round(w / jnp.maximum(scale, 1e-12)), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)
    q, scale = pl.pallas_call(
        _quant_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(w.shape, jnp.int8),
            jax.ShapeDtypeStruct((1, w.shape[1]), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(w, jnp.asarray([seed], jnp.int32))
    return q, scale


def quantize_int4(w: jnp.ndarray):
    """w [in, out] -> (packed uint8 [in//2, out], scale fp32 [1, out]).

    Per-out-channel symmetric int4 in [-7, 7] — the TPU analogue of
    bitsandbytes 4-bit loading (reference llava/model/builder.py:29-38).
    HALF-SPLIT packing: byte i packs row i (low nibble) and row i+in/2
    (high nibble), so unpacking never interleaves along the contraction
    dim — the two nibble planes feed two clean dots (an interleaved
    [0::2]/[1::2] layout costs a sublane shuffle per matmul and measured
    ~8x slower decode). `in` must be even.
    """
    assert w.shape[0] % 2 == 0, "int4 packing needs an even contraction dim"
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = (absmax / 7.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / jnp.maximum(scale, 1e-12)), -7, 7).astype(jnp.int8)
    qu = (q & 0xF).astype(jnp.uint8)
    half = w.shape[0] // 2
    packed = qu[:half] | (qu[half:] << 4)
    return packed, scale


def quantize_int4_paired(w: jnp.ndarray):
    """w [in, out] -> (packed uint8 [in//2, out], scale fp32 [1, out]).

    ADJACENT-PAIR packing: byte i packs row 2i (low nibble) and row 2i+1
    (high nibble) — exactly the layout `pltpu.bitcast(packed, jnp.int4)`
    reinterprets in-register (byte row i -> s4 rows 2i=low, 2i+1=high,
    verified on hardware by tools/bitcast_probe.py). The dequant inside
    the GEMV kernel is then ONE hardware s4->bf16 cast with no sublane
    shuffle and no per-nibble shift math, unlike the half-split layout
    whose unpack is VPU-bound (see _qmm_kernel). Same [-7, 7] symmetric
    grid and scales as quantize_int4. `in` must be even."""
    assert w.shape[0] % 2 == 0, "int4 packing needs an even contraction dim"
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = (absmax / 7.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / jnp.maximum(scale, 1e-12)), -7, 7).astype(jnp.int8)
    qu = (q & 0xF).astype(jnp.uint8)
    packed = qu[0::2] | (qu[1::2] << 4)
    return packed, scale


def unpack_int4_paired(packed: jnp.ndarray) -> jnp.ndarray:
    """packed uint8 [in//2, out] -> int8 [in, out] in [-7, 7]
    (adjacent-pair layout: see quantize_int4_paired)."""
    lo, hi = _sx4(packed), _sx4(packed >> 4)
    half, cout = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * half, cout)


def _qmm_paired_kernel(x_ref, q_ref, s_ref, o_ref):
    """Dequant-fused GEMV tile for the adjacent-pair int4 layout: the
    packed uint8 block is reinterpreted as s4 in VMEM (pltpu.bitcast is a
    no-op relayout) and widened with ONE hardware cast — no per-nibble
    shift chain, so the dequant is no longer VPU-throughput-bound."""
    from jax.experimental.pallas import tpu as pltpu  # local: CPU-safe import

    s4 = pltpu.bitcast(q_ref[:], jnp.int4)           # [cin, bout]
    w = s4.astype(x_ref.dtype)
    acc = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = acc * s_ref[:].astype(jnp.float32)


def _paired_bout(cin: int, cout: int) -> int:
    """Out-block width for the paired GEMV: the largest multiple of 128
    dividing cout whose PACKED block (cin/2 x bout uint8) stays <= ~7 MB.

    Measured on v5e (tools/gemv_sweep.py, 13B qkv shape): tiny 1.3 MB
    blocks pipeline at ~370 GB/s, ~5 MB blocks at ~440 GB/s, and one
    4-block-per-GEMV monolith falls back to 193 GB/s (first-fetch latency
    stops being hidden) — the dequant's s4->bf16 VPU cast rate (~1 Telem/s)
    is the real ceiling, and ~5 MB blocks keep the fetch pipeline full
    without starving double-buffering. The bf16 staging of the widened
    block lives on the kernel stack, so callers must raise
    vmem_limit_bytes past the 16 MB default."""
    best = 0
    for bout in range(128, cout // 4 + 1, 128):
        if cout % bout:
            continue
        if (cin // 2) * bout > 7 * 2**20:
            break
        best = bout
    return best


def int4_paired_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray):
    """x [B, in] @ dequant(packed, adjacent-pair layout) -> [B, out] fp32.

    Pallas one-cast dequant GEMV on TPU for decode-sized B; XLA unpack
    fallback elsewhere. Unlike int4_native_matmul no s4 jax.Array ever
    crosses the jit boundary (the tunneled backend RecursionErrors on
    eager s4 buffers), so this is the production native-cast path."""
    cin2, cout = packed.shape
    cin = 2 * cin2
    bout = _paired_bout(cin, cout)
    if (
        jax.default_backend() == "tpu" and x.ndim == 2 and x.shape[0] <= 32
        and x.shape[1] == cin and cin % 256 == 0 and cin2 % 8 == 0 and bout
    ):
        b = x.shape[0]
        bpad = (-b) % 8
        xb = jnp.pad(x, ((0, bpad), (0, 0))) if bpad else x
        out = pl.pallas_call(
            _qmm_paired_kernel,
            grid=(cout // bout,),
            in_specs=[
                pl.BlockSpec((xb.shape[0], cin), lambda oo: (0, 0)),
                pl.BlockSpec((cin2, bout), lambda oo: (0, oo)),
                pl.BlockSpec((1, bout), lambda oo: (0, oo)),
            ],
            out_specs=pl.BlockSpec((xb.shape[0], bout), lambda oo: (0, oo)),
            out_shape=jax.ShapeDtypeStruct((xb.shape[0], cout), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ),
        )(xb, packed, scale)
        return out[:b]
    q = unpack_int4_paired(packed)
    y = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
    return y * scale.astype(jnp.float32)


def _qmm_w4a8_kernel(x_ref, q_ref, s_ref, o_ref):
    """W4A8 GEMV tile: the packed block is bitcast to s4 and widened with a
    NARROW 4->8 bit cast, then the dot runs on the MXU in native int8 with
    exact int32 accumulation — no s4->bf16 widening (the ~1 Telem/s VPU
    ceiling of the bf16 paired kernel). Weight scales fold in here; the
    per-row activation scale folds in outside."""
    s4 = pltpu.bitcast(q_ref[:], jnp.int4)
    acc = jax.lax.dot_general(
        x_ref[:], s4.astype(jnp.int8), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:].astype(jnp.float32)


def quantize_act_int8(x: jnp.ndarray):
    """x [B, in] float -> (xq int8 [B, in], xs fp32 [B, 1]) per-row
    symmetric: x ~ xq * xs / 127. The dynamic activation half of W4A8."""
    xs = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True), 1e-6
    )
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (127.0 / xs)), -127, 127
    ).astype(jnp.int8)
    return xq, xs


def int4_w4a8_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray):
    """x [B, in] @ dequant(packed, adjacent-pair int4) -> [B, out] fp32,
    with the activation dynamically quantized to per-row int8 (W4A8).

    Same 'qp'/'scale' params as int4_paired_matmul — W4A8 is an execution
    mode, not a checkpoint format. The integer accumulation is exact, so
    the XLA fallback below (same int8 x, int32 dot) is bit-identical to the
    Pallas kernel up to the final fp32 scale multiplies."""
    cin2, cout = packed.shape
    cin = 2 * cin2
    xq, xs = quantize_act_int8(x)
    bout = _paired_bout(cin, cout)
    if (
        jax.default_backend() == "tpu" and x.ndim == 2 and x.shape[0] <= 32
        and x.shape[1] == cin and cin % 256 == 0 and cin2 % 8 == 0 and bout
    ):
        b = x.shape[0]
        bpad = (-b) % 8
        xb = jnp.pad(xq, ((0, bpad), (0, 0))) if bpad else xq
        out = pl.pallas_call(
            _qmm_w4a8_kernel,
            grid=(cout // bout,),
            in_specs=[
                pl.BlockSpec((xb.shape[0], cin), lambda oo: (0, 0)),
                pl.BlockSpec((cin2, bout), lambda oo: (0, oo)),
                pl.BlockSpec((1, bout), lambda oo: (0, oo)),
            ],
            out_specs=pl.BlockSpec((xb.shape[0], bout), lambda oo: (0, oo)),
            out_shape=jax.ShapeDtypeStruct((xb.shape[0], cout), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ),
        )(xb, packed, scale)[:b]
    else:
        q = unpack_int4_paired(packed)
        acc = jax.lax.dot_general(
            xq, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * scale.astype(jnp.float32)
    return out * (xs * (1.0 / 127.0))


def _qmm_fused_kernel(*refs, norm: bool, siluglu: bool, residual: bool,
                      act_int8: bool, eps: float, xdtype):
    """Paired-int4 GEMV with the decode glue folded in (one launch instead
    of launch + 2-4 XLA fusions between launches):
      prologue: RMSNorm (gamma) | SiLU-GLU (h = silu(x[:, :half])*x[:, half:])
      body:     one-cast s4 dequant dot (bf16) or in-kernel per-row int8
                activation quant + native int8 MXU dot (W4A8)
      epilogue: weight/activation scales (+ residual add)
    The prologue recomputes per grid step on a [B, cin]-sized block — a few
    hundred KB of VPU work against MBs of weight streaming per step."""
    i = 0
    x_ref = refs[i]; i += 1
    g_ref = None
    if norm:
        g_ref = refs[i]; i += 1
    q_ref, s_ref = refs[i], refs[i + 1]; i += 2
    r_ref = None
    if residual:
        r_ref = refs[i]; i += 1
    o_ref = refs[i]

    xf = x_ref[:].astype(jnp.float32)
    if norm:
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        xf = xf * g_ref[:].astype(jnp.float32)
    elif siluglu:
        half = xf.shape[-1] // 2
        a = xf[:, :half]
        xf = (a * jax.nn.sigmoid(a)) * xf[:, half:]

    s4 = pltpu.bitcast(q_ref[:], jnp.int4)
    if act_int8:
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6)
        xq = jnp.clip(jnp.round(xf * (127.0 / xs)), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, s4.astype(jnp.int8), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (xs * (1.0 / 127.0))
    else:
        acc = jax.lax.dot_general(
            xf.astype(xdtype), s4.astype(xdtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc * s_ref[:].astype(jnp.float32)
    if residual:
        acc = acc + r_ref[:].astype(jnp.float32)
    o_ref[:] = acc


def int4_paired_fused_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    gamma: jnp.ndarray | None = None,
    eps: float = 1e-6,
    siluglu: bool = False,
    residual: jnp.ndarray | None = None,
    act_int8: bool = False,
):
    """Fused decode projection for the paired-int4 layout.

    x [B, cin] (or [B, 2*cin] when siluglu) float; optional RMSNorm
    prologue with `gamma` [cin]; optional SiLU-GLU prologue (mutually
    exclusive with gamma); optional residual [B, cout] added in fp32;
    act_int8 switches the dot to W4A8. Returns [B, cout] fp32. The XLA
    fallback composes the identical math op-by-op, so CPU tests pin the
    kernel semantics; on CPU (fp32 activations) fused == unfused exactly."""
    assert not (gamma is not None and siluglu)
    cin2, cout = packed.shape
    cin = 2 * cin2
    xin = 2 * cin if siluglu else cin
    bout = _paired_bout(cin, cout)
    xdtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    if (
        jax.default_backend() == "tpu" and x.ndim == 2 and x.shape[0] <= 32
        and x.shape[1] == xin and cin % 256 == 0 and cin2 % 8 == 0 and bout
    ):
        b = x.shape[0]
        bpad = (-b) % 8
        xb = jnp.pad(x, ((0, bpad), (0, 0))) if bpad else x
        bb = xb.shape[0]
        norm = gamma is not None
        inputs = [xb]
        in_specs = [pl.BlockSpec((bb, xin), lambda oo: (0, 0))]
        if norm:
            inputs.append(gamma.reshape(1, cin))
            in_specs.append(pl.BlockSpec((1, cin), lambda oo: (0, 0)))
        inputs += [packed, scale]
        in_specs += [
            pl.BlockSpec((cin2, bout), lambda oo: (0, oo)),
            pl.BlockSpec((1, bout), lambda oo: (0, oo)),
        ]
        if residual is not None:
            rb = jnp.pad(residual, ((0, bpad), (0, 0))) if bpad else residual
            inputs.append(rb)
            in_specs.append(pl.BlockSpec((bb, bout), lambda oo: (0, oo)))
        out = pl.pallas_call(
            functools.partial(
                _qmm_fused_kernel, norm=norm, siluglu=siluglu,
                residual=residual is not None, act_int8=act_int8, eps=eps,
                xdtype=xdtype,
            ),
            grid=(cout // bout,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bb, bout), lambda oo: (0, oo)),
            out_shape=jax.ShapeDtypeStruct((bb, cout), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ),
        )(*inputs)
        return out[:b]

    xf = x.astype(jnp.float32)
    if gamma is not None:
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        xf = xf * gamma.astype(jnp.float32)
    elif siluglu:
        a = xf[:, :cin]
        xf = (a * jax.nn.sigmoid(a)) * xf[:, cin:]
    if act_int8:
        xq, xs = quantize_act_int8(xf)
        acc = jax.lax.dot_general(
            xq, unpack_int4_paired(packed), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (xs * (1.0 / 127.0))
    else:
        acc = jnp.dot(
            xf.astype(xdtype),
            unpack_int4_paired(packed).astype(xdtype),
            preferred_element_type=jnp.float32,
        )
    out = acc * scale.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out


def _qmm_pair_kernel(
    x_ref, qp1_ref, sc1_ref, r_ref, g_ref, qp2_ref, sc2_ref,
    osm_ref, obig_ref, sm_scr,
    *, n1, siluglu1, eps, xdtype, bout1,
):
    """TWO chained paired-int4 GEMVs in ONE launch (phase-split grid).

    Steps 0..n1-1 (phase 1) compute disjoint out-blocks of
      small = glue1(x) @ deq(qp1) * sc1 + residual
    into both the `small` output and a VMEM scratch; steps n1.. (phase 2)
    recompute RMSNorm(small) from scratch (order-invariant mean; block-major
    reconstruction preserves feature order) and stream qp2's out-blocks:
      big = RMSNorm(small, gamma) @ deq(qp2) * sc2.
    Halves the captioner decode's launch count (4 -> 2 per layer) and lets
    qp2's first block prefetch under phase-1 compute."""
    step = pl.program_id(0)

    @pl.when(step < n1)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if siluglu1:
            half = xf.shape[-1] // 2
            a = xf[:, :half]
            xf = (a * jax.nn.sigmoid(a)) * xf[:, half:]
        s4 = pltpu.bitcast(qp1_ref[:], jnp.int4)
        acc = jax.lax.dot_general(
            xf.astype(xdtype), s4.astype(xdtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * sc1_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)
        osm_ref[:] = acc
        sm_scr[step] = acc

    @pl.when(step >= n1)
    def _():
        # RMSNorm + GEMV2 over the block-major scratch WITHOUT relayout:
        # the mean is order-invariant (combine per-chunk sums of squares)
        # and the dot decomposes into per-chunk dots against statically
        # sliced row-bands of qp2 (packed row r holds unpacked rows
        # 2r/2r+1, so band j of bout1//2 packed rows == features
        # [j*bout1, (j+1)*bout1) of `small`).
        sq = sm_scr[0] * sm_scr[0]
        for j in range(1, n1):
            sq = sq + sm_scr[j] * sm_scr[j]
        # sum over features: per-chunk partial sums were elementwise-added
        # above, so one lane-reduce finishes the full-vector sum
        denom = jnp.sum(sq, axis=-1, keepdims=True) / (n1 * bout1)
        rr = jax.lax.rsqrt(denom + eps)
        acc = None
        half1 = bout1 // 2
        for j in range(n1):
            nf = sm_scr[j] * rr * g_ref[:, j * bout1 : (j + 1) * bout1].astype(
                jnp.float32)
            s4 = pltpu.bitcast(
                qp2_ref[j * half1 : (j + 1) * half1, :], jnp.int4)
            part = jax.lax.dot_general(
                nf.astype(xdtype), s4.astype(xdtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        obig_ref[:] = acc * sc2_ref[:].astype(jnp.float32)


def int4_paired_fused_pair(
    x: jnp.ndarray,
    qp1: jnp.ndarray,
    sc1: jnp.ndarray,
    residual: jnp.ndarray,
    gamma: jnp.ndarray,
    qp2: jnp.ndarray,
    sc2: jnp.ndarray,
    *,
    siluglu1: bool = False,
    eps: float = 1e-6,
):
    """Chained decode projection pair for the paired-int4 layout.

    Returns (small, big):
      small = (siluglu(x) if siluglu1 else x) @ deq(qp1) * sc1 + residual
      big   = RMSNorm(small, gamma) @ deq(qp2) * sc2
    Covers both per-layer merges of the llama decode block:
      o_proj(+residual) -> post_norm -> gateup_proj           (siluglu1=False)
      down_proj(+residual) -> next input_norm -> next qkv_proj (siluglu1=True)
    so a 40-layer decode runs 2 launches/layer instead of 4. The XLA
    fallback composes identical math op-by-op (CPU tests pin semantics)."""
    cin1_2, cout1 = qp1.shape
    cin1 = 2 * cin1_2
    cin2_2, cout2 = qp2.shape
    assert 2 * cin2_2 == cout1, (qp1.shape, qp2.shape)
    xin = 2 * cin1 if siluglu1 else cin1
    xdtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    bout1 = _paired_bout(cin1, cout1)
    bout2 = _paired_bout(cout1, cout2)
    if (
        jax.default_backend() == "tpu" and x.ndim == 2 and x.shape[0] <= 32
        and x.shape[1] == xin and cin1 % 256 == 0 and cin1_2 % 8 == 0
        and cout1 % 256 == 0 and cin2_2 % 8 == 0 and bout1 and bout2
    ):
        b = x.shape[0]
        bpad = (-b) % 8
        pad = lambda t: jnp.pad(t, ((0, bpad), (0, 0))) if bpad else t
        xb, rb = pad(x), pad(residual)
        bb = xb.shape[0]
        n1, n2 = cout1 // bout1, cout2 // bout2
        small, big = pl.pallas_call(
            functools.partial(
                _qmm_pair_kernel, n1=n1, siluglu1=siluglu1, eps=eps,
                xdtype=xdtype, bout1=bout1,
            ),
            grid=(n1 + n2,),
            in_specs=[
                pl.BlockSpec((bb, xin), lambda i: (0, 0)),
                pl.BlockSpec((cin1_2, bout1), lambda i: (0, jnp.minimum(i, n1 - 1))),
                pl.BlockSpec((1, bout1), lambda i: (0, jnp.minimum(i, n1 - 1))),
                pl.BlockSpec((bb, bout1), lambda i: (0, jnp.minimum(i, n1 - 1))),
                pl.BlockSpec((1, cout1), lambda i: (0, 0)),
                pl.BlockSpec((cin2_2, bout2), lambda i: (0, jnp.maximum(i - n1, 0))),
                pl.BlockSpec((1, bout2), lambda i: (0, jnp.maximum(i - n1, 0))),
            ],
            out_specs=[
                pl.BlockSpec((bb, bout1), lambda i: (0, jnp.minimum(i, n1 - 1))),
                pl.BlockSpec((bb, bout2), lambda i: (0, jnp.maximum(i - n1, 0))),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bb, cout1), jnp.float32),
                jax.ShapeDtypeStruct((bb, cout2), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((n1, bb, bout1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ),
        )(xb, qp1, sc1, rb, gamma.reshape(1, cout1), qp2, sc2)
        return small[:b], big[:b]

    small = int4_paired_fused_matmul(
        x, qp1, sc1, siluglu=siluglu1, residual=residual
    )
    big = int4_paired_fused_matmul(
        small.astype(x.dtype), qp2, sc2, gamma=gamma, eps=eps
    )
    return small, big


def quantize_int4_native(w: jnp.ndarray):
    """w [in, out] -> (q jnp.int4 [in, out], scale fp32 [1, out]).

    Native-s4 variant of `quantize_int4`: XLA bit-packs jnp.int4 buffers
    (verified 0.5 byte/elem), so the HBM stream is identical to the manual
    uint8 half-split packing, but the dequant is ONE hardware cast instead
    of per-nibble shift math. Values match quantize_int4 bit-for-bit
    (same [-7, 7] symmetric grid and scales)."""
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = (absmax / 7.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / jnp.maximum(scale, 1e-12)), -7, 7).astype(jnp.int4)
    return q, scale


def _qmm_native_kernel(x_ref, q_ref, s_ref, o_ref):
    qb = q_ref[:].astype(x_ref.dtype)  # s4 -> compute dtype, one cast
    acc = jax.lax.dot_general(
        x_ref[:], qb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = acc * s_ref[:].astype(jnp.float32)


def int4_native_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray):
    """x [B, in] @ dequant(q s4) -> [B, out] fp32. Pallas single-out-block
    GEMV on TPU for decode-sized B (mirrors `_qmm`); XLA fused convert+dot
    elsewhere (also streams the packed s4 buffer)."""
    cin, cout = q.shape
    if (
        jax.default_backend() == "tpu" and x.ndim == 2 and x.shape[0] <= 32
        and cin % 256 == 0
        and cout % _qmm_bout(cin, cout, 4) == 0
        and os.environ.get("SUPIR_INT4_NATIVE_XLA") != "1"
    ):
        b = x.shape[0]
        bpad = (-b) % 8
        xb = jnp.pad(x, ((0, bpad), (0, 0))) if bpad else x
        bout = _qmm_bout(cin, cout, 4)
        out = pl.pallas_call(
            _qmm_native_kernel,
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
    y = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
    return y * scale.astype(jnp.float32)


def _sx4(u: jnp.ndarray) -> jnp.ndarray:
    """Sign-extend a 4-bit two's-complement nibble held in a uint8."""
    return ((u & 0xF).astype(jnp.int8) ^ 8) - 8


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """packed uint8 [in//2, out] -> int8 [in, out] in [-7, 7]
    (half-split layout: see quantize_int4)."""
    return jnp.concatenate([_sx4(packed), _sx4(packed >> 4)], axis=0)


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref, *, bits):
    """Dequant-fused matmul tile: the weight block arrives int8/int4-packed
    in VMEM and is widened to bf16 in-register — quantized bytes are the
    ONLY weight HBM traffic. One grid dim over out-blocks, full contraction
    per block: a GEMV is overhead-bound, so the grid stays as small as the
    shape allows (a 2D (out, in) grid measured SLOWER than the plain XLA
    dequantize-then-dot at 13B decode: 11.5 vs 17 tokens/s)."""
    qb = q_ref[:]  # int8 [cin, bout] | uint8 [cin/2, bout] half-split
    x = x_ref[:]
    if bits == 8:
        acc = jax.lax.dot_general(
            x, qb.astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        half = qb.shape[0]
        # Mosaic legalizes no u8/i8 vector arithmetic (subi, shrui) and no
        # u8->float casts — widen the packed block to int32 (the int4 block
        # budget keeps the 4x staging affordable) and sign-extend each
        # nibble with a shift PAIR: (b<<28)>>28 is the low nibble,
        # (b<<24)>>28 the high one. At 12.7B nibbles/token the dequant is
        # VPU-bound, not HBM-bound, so every op off the per-nibble path is
        # throughput — the shift pair replaces the 4-op mask/xor/sub chain
        # and the &0xFF byte clean-up (the left shift discards those bits)
        q32 = pltpu.bitcast(qb, jnp.int8).astype(jnp.int32)
        lo = ((q32 << 28) >> 28).astype(x.dtype)
        hi = ((q32 << 24) >> 28).astype(x.dtype)
        acc = jax.lax.dot_general(
            x[:, :half], lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + jax.lax.dot_general(
            x[:, half:], hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[:] = acc * s_ref[:].astype(jnp.float32)


def _qmm_bout(cin: int, cout: int, bits: int) -> int:
    # weight block (cin[/2] x bout) bytes, double-buffered, within budget;
    # int4 gets a tighter one — its dequantized bf16 staging (4x the packed
    # bytes) lives on the Mosaic stack too
    budget = 8 * 2**20 if bits == 8 else 3 * 2**20
    row_bytes = cin if bits == 8 else cin // 2
    bout = 512
    while bout * 2 * row_bytes * 2 <= budget and cout % (bout * 2) == 0:
        bout *= 2
    while bout > 128 and (cout % bout or bout * row_bytes * 2 > budget):
        bout //= 2
    return bout


def _qmm_viable(x, w_rows, out_dim, bits):
    if not (jax.default_backend() == "tpu" and x.ndim == 2 and x.shape[0] <= 32):
        return False
    if x.shape[1] % 256 or w_rows % 128:
        return False
    return out_dim % _qmm_bout(x.shape[1], out_dim, bits) == 0


def _qmm(x, q, scale, bits, interpret=False):
    cin = x.shape[1]
    cout = q.shape[1]
    b = x.shape[0]
    bpad = (-b) % 8
    xb = jnp.pad(x, ((0, bpad), (0, 0))) if bpad else x
    bout = _qmm_bout(cin, cout, bits)
    kernel = functools.partial(_qmm_kernel, bits=bits)
    out = pl.pallas_call(
        kernel,
        grid=(cout // bout,),
        in_specs=[
            pl.BlockSpec((xb.shape[0], cin), lambda oo: (0, 0)),
            pl.BlockSpec((q.shape[0], bout), lambda oo: (0, oo)),
            pl.BlockSpec((1, bout), lambda oo: (0, oo)),
        ],
        out_specs=pl.BlockSpec((xb.shape[0], bout), lambda oo: (0, oo)),
        out_shape=jax.ShapeDtypeStruct((xb.shape[0], cout), jnp.float32),
        interpret=interpret,
    )(xb, q, scale)
    return out[:b]


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray):
    """x [B, in] @ dequant(packed) -> [B, out] fp32; weights stay 4-bit in
    HBM (Pallas dequant-fused kernel on TPU for decode-sized B; XLA
    fallback elsewhere)."""
    if _qmm_viable(x, packed.shape[0], packed.shape[1], 4):
        return _qmm(x, packed, scale, bits=4)
    q = unpack_int4(packed)
    y = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
    return y * scale.astype(jnp.float32)


def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray):
    """x [B, in] @ dequant(q) -> [B, out] fp32; int8 weights stay int8 in
    HBM (Pallas dequant-fused kernel on TPU for decode-sized B; XLA
    fallback elsewhere)."""
    if _qmm_viable(x, q.shape[0], q.shape[1], 8):
        return _qmm(x, q, scale, bits=8)
    y = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
    return y * scale.astype(jnp.float32)


def quantize_tree_int8(params, filter_fn=None):
    """Quantize all >=2D fp32/bf16 kernels in a pytree; returns
    (tree with {'q','scale'} leaves for quantized entries, bytes saved)."""
    saved = [0]

    def one(path, x):
        name = "/".join(str(p) for p in path)
        if (
            hasattr(x, "ndim") and x.ndim == 2
            and x.dtype in (jnp.float32, jnp.bfloat16)
            and (filter_fn is None or filter_fn(name, x))
        ):
            q, scale = quantize_int8(x.astype(jnp.float32))
            saved[0] += x.size * x.dtype.itemsize - q.size - scale.size * 4
            return {"q": q, "scale": scale}
        return x

    import jax.tree_util as jtu

    flat, treedef = jtu.tree_flatten_with_path(params)
    out = [one(tuple(k.key for k in path if hasattr(k, "key")), v) for path, v in flat]
    return jtu.tree_unflatten(treedef, out), saved[0]
