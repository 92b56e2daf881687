"""Llama decoder (Vicuna-13B class) for the captioner, TPU-native.

Behavioral contract: the reference's LLaVA language model is a HF Llama
CausalLM (`llava/model/language_model/llava_llama.py:41`). Here: RMSNorm,
rotary embeddings, SwiGLU MLP, pre-norm blocks, and a static-shape KV cache
driven by `lax.scan` for autoregressive decode (no dynamic shapes; decode
compiles once for a fixed cache length).

Tensor-parallel ready: attention heads and MLP hidden dim are sharded over
the 'model' mesh axis through with_sharding_constraint when a mesh is
active (the reference instead splits the 13B model onto a second GPU,
test.py:10-17).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.models.layers import Dense
from supir_tpu.ops import dot_product_attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 5120          # 13B
    layers: int = 40
    heads: int = 40
    kv_heads: int = 40       # MHA for llama-1/2 13B
    hidden_dim: int = 13824
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    # weight quantization of the block projections — the TPU analogue of
    # --load_8bit_llava / --load_4bit_llava (reference builder.py:29-38):
    # int8/int4 kernels cut HBM traffic for the memory-bound decode
    quantize_int8: bool = False
    quantize_int4: bool = False
    # merged qkv / gate-up projections (quantized decode only): per-out-
    # channel scales make the merged quantization bit-identical to three
    # separate ones, and 7 -> 4 Pallas GEMV launches per block cuts decode
    # per-call overhead (280 -> 160 launches/token at 40 layers)
    fused_qkv: bool = False
    # store int4 weights as native jnp.int4 (XLA bit-packs s4, same HBM
    # bytes) so the dequant is one hardware cast instead of per-nibble
    # shift math; same [-7,7] grid as the packed layout
    int4_native: bool = False
    # adjacent-pair uint8 packing + in-kernel pltpu.bitcast to s4: the
    # dequant is one hardware s4->bf16 cast (like int4_native) but no s4
    # jax.Array ever crosses the jit boundary (the tunneled TPU backend
    # can't materialize eager s4 buffers). Measured 370 -> 440 GB/s over
    # the half-split shift-pair kernel at 13B decode shapes — the
    # production int4 layout. Same [-7,7] grid as the others.
    int4_paired: bool = True
    # W4A8 execution mode for the paired int4 layout: activations are
    # dynamically quantized to per-row int8 and the dot runs on the MXU in
    # native int8 (int32 accumulation) — the dequant is a narrow s4->s8
    # widen instead of the VPU-ceiling s4->bf16 cast. Same 'qp' checkpoint
    # params; changes numerics (activation rounding), so opt-in.
    act_int8: bool = False
    # fold the decode glue (RMSNorm prologues, SiLU-GLU, residual adds)
    # into the paired-int4 GEMV kernels: 4 launches per block with NO XLA
    # fusions between them except rotary/cache/attention. Identical param
    # tree (the shim modules declare the same names at the same paths) and
    # exactly the same math on the CPU fallback. Needs int4_paired+fused_qkv.
    fused_glue: bool = True
    # int8 per-out-channel lm_head (quantize_llama_params head_int8=True):
    # halves the 0.33 GB/token bf16 head stream at 13B dims. Opt-in — it
    # perturbs logits directly (the reference keeps the head fp16).
    head_int8: bool = False
    # chain TWO GEMVs per Pallas launch on the decode path (ops/quantize.py
    # int4_paired_fused_pair): [o+residual -> post_norm -> gateup] and
    # [siluglu+down+residual -> next input_norm -> next qkv] each become
    # one launch — 2 launches/layer instead of 4 (160 -> ~82/token at 40
    # layers). Same math as fused_glue (CPU fallback composes identically);
    # decode-path only (prefill keeps the per-block modules). Needs
    # int4_paired + fused_qkv + MHA.
    fused_pairs: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    def tiny(self) -> "LlamaConfig":
        return dataclasses.replace(
            self, vocab_size=256, dim=64, layers=2, heads=4, kv_heads=4,
            hidden_dim=128, max_seq_len=128,
        )


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf**2, axis=-1, keepdims=True) + self.eps)
        return (xf * w).astype(self.dtype)


def rotary_cos_sin(positions, head_dim, theta=10000.0):
    """positions [B, S] -> cos/sin [B, S, head_dim//2]."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv[None, None]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rotary(x, cos, sin):
    """x [B, S, H, D]; rotate-half convention (HF Llama)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


class Int4Dense(nn.Module):
    """Dense with packed 4-bit weights ({'q4','scale'} params)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from supir_tpu.ops.quantize import int4_matmul

        q4 = self.param(
            "q4",
            lambda k, s: jnp.zeros(s, jnp.uint8),
            (x.shape[-1] // 2, self.features),
        )
        scale = self.param(
            "scale", nn.initializers.ones, (1, self.features), jnp.float32
        )
        lead = x.shape[:-1]
        y = int4_matmul(x.reshape(-1, x.shape[-1]).astype(self.dtype), q4, scale)
        return y.reshape(lead + (self.features,)).astype(self.dtype)


class Int4PairedDense(nn.Module):
    """Dense with adjacent-pair packed 4-bit weights ({'qp','scale'}
    params, see ops/quantize.py:quantize_int4_paired). Distinct param name
    so a half-split 'q4' checkpoint can never silently load as paired.
    `act_int8` switches the same params to W4A8 execution (per-row int8
    activations + native int8 MXU dot)."""

    features: int
    dtype: Dtype = jnp.float32
    act_int8: bool = False

    @nn.compact
    def __call__(self, x):
        from supir_tpu.ops.quantize import int4_paired_matmul, int4_w4a8_matmul

        qp = self.param(
            "qp",
            lambda k, s: jnp.zeros(s, jnp.uint8),
            (x.shape[-1] // 2, self.features),
        )
        scale = self.param(
            "scale", nn.initializers.ones, (1, self.features), jnp.float32
        )
        lead = x.shape[:-1]
        mm = int4_w4a8_matmul if self.act_int8 else int4_paired_matmul
        y = mm(x.reshape(-1, x.shape[-1]).astype(self.dtype), qp, scale)
        return y.reshape(lead + (self.features,)).astype(self.dtype)


class Int4NativeDense(nn.Module):
    """Dense with native jnp.int4 weights ({'qn','scale'} params)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from supir_tpu.ops.quantize import int4_native_matmul

        qn = self.param(
            "qn",
            lambda k, s: jnp.zeros(s, jnp.int4),
            (x.shape[-1], self.features),
        )
        scale = self.param(
            "scale", nn.initializers.ones, (1, self.features), jnp.float32
        )
        lead = x.shape[:-1]
        y = int4_native_matmul(
            x.reshape(-1, x.shape[-1]).astype(self.dtype), qn, scale
        )
        return y.reshape(lead + (self.features,)).astype(self.dtype)


class Int8Dense(nn.Module):
    """Dense with per-out-channel symmetric int8 weights ({'q','scale'}
    params, see ops/quantize.py). Dequant fuses into the matmul epilogue;
    int8 kernels stay int8 in HBM."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from supir_tpu.ops.quantize import int8_matmul

        q = self.param(
            "q", nn.initializers.zeros, (x.shape[-1], self.features), jnp.int8
        )
        scale = self.param(
            "scale", nn.initializers.ones, (1, self.features), jnp.float32
        )
        lead = x.shape[:-1]
        y = int8_matmul(x.reshape(-1, x.shape[-1]).astype(self.dtype), q, scale)
        return y.reshape(lead + (self.features,)).astype(self.dtype)


def _quant_kv(x):
    """[B, S, H, D] -> (int8 [B, S, H, D], fp32 scale [B, S, H, 1]).

    Per-(position, head) symmetric int8 for the KV cache — the analogue of
    the weight quantization in ops/quantize.py applied to the decode's
    other big HBM stream. Scales live outside the cache lanes so the
    dequant is a fused convert-multiply on the attention dot's operand."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


class _NormScaleParam(nn.Module):
    """Declares RMSNorm's 'weight' param at the SAME path as RMSNorm (give
    it the norm's name) and returns it — the fused-glue path folds the
    norm into the GEMV kernel, so the block needs the gamma VALUE, not the
    module application. Checkpoints are layout-identical either way."""

    @nn.compact
    def __call__(self, dim):
        return self.param("weight", nn.initializers.ones, (dim,), jnp.float32)


class _Int4PairedParams(nn.Module):
    """Declares Int4PairedDense's {'qp','scale'} at the same path (same
    name) and returns them for fused-kernel consumption."""

    features: int

    @nn.compact
    def __call__(self, cin):
        qp = self.param(
            "qp", lambda k, s: jnp.zeros(s, jnp.uint8),
            (cin // 2, self.features),
        )
        scale = self.param(
            "scale", nn.initializers.ones, (1, self.features), jnp.float32
        )
        return qp, scale


def _int8_kv_attention(q, kq, ks, vq, vs, bias):
    """Attention over an int8 KV cache WITHOUT materializing bf16 K/V.

    The per-(position, head) scales factor out of both dots exactly:
      scores[b,h,i,j] = (q . kq[j]) * ks[j]      (ks scalar per j,h)
      out[b,i,h,d]    = sum_j p[i,j] * vs[j] * vq[j,d] = (p * vs^T) @ vq
    so the dequant is algebraically identical to dequantizing the cache
    first, but the only [B,L,H,D]-sized HBM stream is the int8 cache
    itself — the earlier `kq.astype(bf16) * ks` formulation materialized a
    full bf16 K AND V (3x the bytes) and measured SLOWER than a bf16
    cache (31.9 vs 40.2 tok/s e2e at 13B dims). The int8->bf16 convert
    feeds the dot directly (no intervening multiply), which XLA can fuse
    into the operand read. Measured 12.83 ms/token vs 13.00 bf16-KV at
    13B dims.

    q [B,s,H,D]; kq/vq [B,L,H,D] int8; ks/vs [B,H,L] fp32 scales (L on
    the lane dim); bias [1,1,s,L] additive mask. Returns [B,s,H,D]."""
    dt = q.dtype
    # the factorized einsums pair query head h with cache head h directly;
    # a GQA cache (kv_heads < heads) would need the scales and quantized
    # planes broadcast over the query-head groups first — fail loudly
    # rather than with an opaque shape error (llava-13b is MHA)
    assert q.shape[2] == kq.shape[2], (
        f"int8-KV factorized attention requires kv_heads == heads "
        f"(got {kq.shape[2]} kv heads, {q.shape[2]} query heads); use the "
        f"bf16 KV path for GQA configs"
    )
    scores = jnp.einsum(
        "bshd,blhd->bhsl", q, kq.astype(dt),
        preferred_element_type=jnp.float32,
    )
    scores = scores * ks[:, :, None, :]  # [B,H,1,L]
    scores = scores * (1.0 / np.sqrt(q.shape[-1])) + bias
    p = jax.nn.softmax(scores, axis=-1)
    p = p * vs[:, :, None, :]
    out = jnp.einsum(
        "bhsl,blhd->bshd", p.astype(dt), vq.astype(dt),
        preferred_element_type=jnp.float32,
    )
    return out.astype(dt)


_PROJ_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


def quantize_llama_params(params, bits: int = 8, fuse: bool = False,
                          native: bool = False, paired: bool = True,
                          head_int8: bool = False):
    """fp llama params -> int8/int4 layout (LlamaConfig quantize_int8 /
    quantize_int4): every block projection's Dense_0/kernel becomes
    {'q','scale'} (8-bit) or {'q4','scale'} (packed 4-bit). With
    fuse=True (LlamaConfig.fused_qkv), q/k/v merge into one qkv_proj and
    gate/up into one gateup_proj along the OUT axis before quantizing —
    per-out-channel scales make the merged result bit-identical to the
    separate quantizations. Returns (new_params, bytes_saved).

    The lm_head kernel is cast to bf16 by default (bitsandbytes keeps
    lm_head in fp16 too, and the reference serves the whole model fp16,
    builder.py:26-148) — an fp32 head kernel alone reads 0.66 GB per
    decoded token. head_int8=True quantizes it per-out-channel int8
    instead (LlamaConfig.head_int8), halving the remaining 0.33 GB/token
    head stream; opt-in because it perturbs the logits themselves."""
    from supir_tpu.ops.quantize import (
        quantize_int4, quantize_int4_native, quantize_int4_paired,
        quantize_int8,
    )

    assert bits in (8, 4)
    saved = [0]

    def one(w):
        if bits == 8:
            q, scale = quantize_int8(jnp.asarray(w))
            new = {"q": q, "scale": scale}
        elif native:
            qn, scale = quantize_int4_native(jnp.asarray(w))
            new = {"qn": qn, "scale": scale}
        elif paired:
            qp, scale = quantize_int4_paired(jnp.asarray(w))
            new = {"qp": qp, "scale": scale}
        else:
            q4, scale = quantize_int4(jnp.asarray(w))
            new = {"q4": q4, "scale": scale}
        new_bytes = sum(
            int(v.size) * (0.5 if v.dtype == jnp.int4 else v.dtype.itemsize)
            for v in new.values()
        )
        saved[0] += int(int(w.size) * 4 - new_bytes)
        return new

    def kern(node, name):
        return np.asarray(node[name]["Dense_0"]["kernel"], np.float32)

    def walk(node):
        if not isinstance(node, dict):
            return node
        if fuse and all(p in node for p in _PROJ_NAMES):
            out = {k: walk(v) for k, v in node.items() if k not in _PROJ_NAMES}
            out["qkv_proj"] = one(np.concatenate(
                [kern(node, "q_proj"), kern(node, "k_proj"), kern(node, "v_proj")], axis=1))
            out["gateup_proj"] = one(np.concatenate(
                [kern(node, "gate_proj"), kern(node, "up_proj")], axis=1))
            out["o_proj"] = one(kern(node, "o_proj"))
            out["down_proj"] = one(kern(node, "down_proj"))
            return out
        out = {}
        for k, v in node.items():
            if k in _PROJ_NAMES and isinstance(v, dict) and "Dense_0" in v:
                out[k] = one(np.asarray(v["Dense_0"]["kernel"], np.float32))
            elif k == "lm_head":
                if head_int8 and isinstance(v, dict) and "Dense_0" in v:
                    q, scale = quantize_int8(
                        jnp.asarray(v["Dense_0"]["kernel"], jnp.float32))
                    out[k] = {"q": q, "scale": scale}
                else:
                    out[k] = jax.tree_util.tree_map(
                        lambda a: jnp.asarray(a, jnp.bfloat16)
                        if getattr(a, "ndim", 0) == 2 else a,
                        v,
                    )
            else:
                out[k] = walk(v)
        return out

    return walk(params), saved[0]


def update_cache_attend(q, k, v, cache, cache_index, s):
    """Shared cache-update + masked attention (LlamaBlock and the fused-
    pair decode path both route here). cache is (k, v) bf16 [B,L,H,D] or
    the int8 4-tuple (kq, ks, vq, vs):

    int8 KV cache: per-(position, head) symmetric scales; the dequant
    (convert * broadcast-scale) fuses into the QK/PV dot operand reads so
    only int8 bytes stream from HBM — halves the decode's second-largest
    HBM term (1.05 GB/token bf16 at 13B dims, cache_len 1280). Values are
    [B,L,H,D] int8 + [B,H,L] scales — scales keep L on the LANE dim; a
    [B,L,H,1] layout lane-pads the trailing 1 to 128 on TPU (26 MB/layer
    of phantom scale bytes at 13B dims instead of 0.2 MB)."""
    if len(cache) == 4:
        kq, ks, vq, vs = cache
        nkq, nks = _quant_kv(k)
        nvq, nvs = _quant_kv(v)
        at = (0, cache_index, 0, 0)
        kq = jax.lax.dynamic_update_slice(kq, nkq, at)
        vq = jax.lax.dynamic_update_slice(vq, nvq, at)
        at_s = (0, 0, cache_index)
        ks = jax.lax.dynamic_update_slice(
            ks, jnp.transpose(nks[..., 0], (0, 2, 1)).astype(ks.dtype),
            at_s)
        vs = jax.lax.dynamic_update_slice(
            vs, jnp.transpose(nvs[..., 0], (0, 2, 1)).astype(vs.dtype),
            at_s)
        k_all, v_all = (kq, ks), (vq, vs)
        new_cache = (kq, ks, vq, vs)
    else:
        ck, cv = cache  # [B, L, H, D]
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
        k_all, v_all = ck, cv
        new_cache = (ck, cv)
    if isinstance(cache_index, int) and cache_index == 0:
        # prefill fast path: nothing precedes these s tokens, so
        # attention over the fresh k/v with a causal mask is exact —
        # skips the [B, H, s, cache_len] full-cache bias logits
        # (cache_len 1280 vs s~700 at 13B) and is flash-eligible
        out = dot_product_attention(q, k, v, causal=True, impl="auto")
    else:
        # mask out cache positions beyond (cache_index + s)
        lcache = (k_all[0] if isinstance(k_all, tuple) else k_all).shape[1]
        col = jnp.arange(lcache)[None, None, None, :]
        valid = col < (cache_index + s)
        bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)
        row = jnp.arange(s)[None, None, :, None] + cache_index
        causal = col <= row
        bias = bias + jnp.where(causal, 0.0, -1e30)
        if isinstance(k_all, tuple):
            out = _int8_kv_attention(q, *k_all, *v_all, bias)
        else:
            out = dot_product_attention(
                q, k_all, v_all, bias=bias, impl="xla")
    return out, new_cache


class LlamaBlock(nn.Module):
    cfg: LlamaConfig
    dtype: Dtype = jnp.float32

    def _dense(self, features, name):
        if self.cfg.quantize_int4:
            if self.cfg.int4_native:
                cls = Int4NativeDense
            elif self.cfg.int4_paired:
                return Int4PairedDense(
                    features, dtype=self.dtype,
                    act_int8=self.cfg.act_int8, name=name,
                )
            else:
                cls = Int4Dense
            return cls(features, dtype=self.dtype, name=name)
        if self.cfg.quantize_int8:
            return Int8Dense(features, dtype=self.dtype, name=name)
        return Dense(features, use_bias=False, dtype=self.dtype, name=name)

    @property
    def _use_fused_glue(self):
        c = self.cfg
        return (c.quantize_int4 and c.int4_paired and not c.int4_native
                and c.fused_glue and c.fused_qkv)

    @nn.compact
    def __call__(self, x, cos, sin, cache=None, cache_index=None, attn_bias=None):
        c = self.cfg
        hd = c.head_dim
        b, s, _ = x.shape
        fused = self._use_fused_glue
        if fused:
            from supir_tpu.ops.quantize import int4_paired_fused_matmul

            x2 = x.reshape(b * s, c.dim)
            g1 = _NormScaleParam(name="input_norm")(c.dim)
            qp, sc = _Int4PairedParams(
                hd * (c.heads + 2 * c.kv_heads), name="qkv_proj")(c.dim)
            qkv = int4_paired_fused_matmul(
                x2.astype(self.dtype), qp, sc, gamma=g1, eps=c.rms_eps,
                act_int8=c.act_int8,
            ).reshape(b, s, -1).astype(self.dtype)
            q = qkv[..., : c.heads * hd]
            k = qkv[..., c.heads * hd : hd * (c.heads + c.kv_heads)]
            v = qkv[..., hd * (c.heads + c.kv_heads) :]
        else:
            h = RMSNorm(c.rms_eps, dtype=self.dtype, name="input_norm")(x)
            if c.fused_qkv:
                qkv = self._dense(hd * (c.heads + 2 * c.kv_heads), "qkv_proj")(h)
                q = qkv[..., : c.heads * hd]
                k = qkv[..., c.heads * hd : hd * (c.heads + c.kv_heads)]
                v = qkv[..., hd * (c.heads + c.kv_heads) :]
            else:
                q = self._dense(c.heads * hd, "q_proj")(h)
                k = self._dense(c.kv_heads * hd, "k_proj")(h)
                v = self._dense(c.kv_heads * hd, "v_proj")(h)
        q = apply_rotary(q.reshape(b, s, c.heads, hd), cos, sin)
        k = apply_rotary(k.reshape(b, s, c.kv_heads, hd), cos, sin)
        v = v.reshape(b, s, c.kv_heads, hd)

        if cache is not None:
            out, new_cache = update_cache_attend(q, k, v, cache, cache_index, s)
        else:
            new_cache = None
            out = dot_product_attention(q, k, v, bias=attn_bias, causal=True, impl="xla")

        out = out.reshape(b, s, c.heads * hd)
        if fused:
            # o_proj + residual, then norm+gateup, then siluglu+down+residual
            # — each ONE kernel launch; the fp32 residual stream never
            # round-trips through extra XLA fusions between launches.
            xr = int4_paired_fused_matmul(
                out.reshape(b * s, -1).astype(self.dtype),
                *_Int4PairedParams(c.dim, name="o_proj")(c.heads * hd),
                residual=x2, act_int8=c.act_int8,
            )
            g2 = _NormScaleParam(name="post_norm")(c.dim)
            gu = int4_paired_fused_matmul(
                xr.astype(self.dtype),
                *_Int4PairedParams(2 * c.hidden_dim, name="gateup_proj")(c.dim),
                gamma=g2, eps=c.rms_eps, act_int8=c.act_int8,
            )
            xr = int4_paired_fused_matmul(
                gu.astype(self.dtype),
                *_Int4PairedParams(c.dim, name="down_proj")(c.hidden_dim),
                siluglu=True, residual=xr, act_int8=c.act_int8,
            )
            return xr.reshape(b, s, c.dim).astype(self.dtype), new_cache

        x = x + self._dense(c.dim, "o_proj")(out)

        h = RMSNorm(c.rms_eps, dtype=self.dtype, name="post_norm")(x)
        if c.fused_qkv:
            gu = self._dense(2 * c.hidden_dim, "gateup_proj")(h)
            gate, up = gu[..., : c.hidden_dim], gu[..., c.hidden_dim :]
        else:
            gate = self._dense(c.hidden_dim, "gate_proj")(h)
            up = self._dense(c.hidden_dim, "up_proj")(h)
        x = x + self._dense(c.dim, "down_proj")(nn.silu(gate) * up)
        return x, new_cache


class LlamaModel(nn.Module):
    """Embedding-in / hidden-out decoder stack. The caller supplies input
    EMBEDDINGS (not ids) because LLaVA splices projected image patches into
    the token embedding sequence (llava_arch.py:95-213)."""

    cfg: LlamaConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, embeds, positions, caches=None, cache_index=None):
        c = self.cfg
        cos, sin = rotary_cos_sin(positions, c.head_dim, c.rope_theta)
        cos = cos.astype(self.dtype)
        sin = sin.astype(self.dtype)
        x = embeds.astype(self.dtype)
        new_caches = []
        for i in range(c.layers):
            cache_i = None if caches is None else caches[i]
            x, nc = LlamaBlock(c, dtype=self.dtype, name=f"layer_{i}")(
                x, cos, sin, cache=cache_i, cache_index=cache_index
            )
            new_caches.append(nc)
        x = RMSNorm(c.rms_eps, dtype=self.dtype, name="norm")(x)
        return x, (new_caches if caches is not None else None)


class LlamaForCausalLM(nn.Module):
    cfg: LlamaConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embed_tokens = nn.Embed(
            self.cfg.vocab_size, self.cfg.dim, dtype=self.dtype,
            param_dtype=jnp.float32, name="embed_tokens",
        )
        self.model = LlamaModel(self.cfg, dtype=self.dtype)
        if self.cfg.head_int8:
            self.lm_head = Int8Dense(self.cfg.vocab_size, dtype=self.dtype)
        else:
            self.lm_head = Dense(
                self.cfg.vocab_size, use_bias=False, dtype=self.dtype)

    def embed(self, ids):
        return self.embed_tokens(ids)

    def __call__(self, embeds, positions, caches=None, cache_index=None):
        x, new_caches = self.model(embeds, positions, caches, cache_index)
        return self.lm_head(x).astype(jnp.float32), new_caches

    def forward_ids(self, ids, positions, caches=None, cache_index=None):
        """ids -> logits; also the init target (touches embed_tokens)."""
        return self(self.embed_tokens(ids), positions, caches, cache_index)

    def init_cache(self, batch: int, length: int, dtype=jnp.float32):
        c = self.cfg
        if dtype == jnp.int8:
            # scales are [B, H, L] (L on the lane dim); see LlamaBlock
            return [
                (
                    jnp.zeros((batch, length, c.kv_heads, c.head_dim), jnp.int8),
                    jnp.zeros((batch, c.kv_heads, length), jnp.float32),
                    jnp.zeros((batch, length, c.kv_heads, c.head_dim), jnp.int8),
                    jnp.zeros((batch, c.kv_heads, length), jnp.float32),
                )
                for _ in range(c.layers)
            ]
        return [
            (
                jnp.zeros((batch, length, c.kv_heads, c.head_dim), dtype),
                jnp.zeros((batch, length, c.kv_heads, c.head_dim), dtype),
            )
            for _ in range(c.layers)
        ]


def fused_pair_decode_step(cfg: LlamaConfig, params, emb, positions, caches,
                           cache_index, compute_dtype=jnp.bfloat16):
    """Decode step over the RAW 'llama' param tree with chained fused-pair
    kernels (LlamaConfig.fused_pairs): per layer, [o_proj+residual ->
    post_norm -> gateup_proj] and [siluglu+down_proj+residual -> NEXT
    layer's input_norm -> NEXT layer's qkv_proj] each run as ONE Pallas
    launch (ops/quantize.int4_paired_fused_pair) — 2 launches/layer vs
    fused_glue's 4. Cross-layer fusion cannot live inside flax module
    scoping (layer i's kernel consumes layer i+1's params), hence this
    functional twin of LlamaModel; numerics match the module path exactly
    on the XLA fallback and to kernel fp32-accum tolerance on TPU.

    params: {'embed_tokens', 'model': {'layer_i', 'norm'}, 'lm_head'}.
    Returns (logits fp32 [B, s, vocab], new_caches)."""
    from supir_tpu.ops.quantize import (
        int4_paired_fused_matmul, int4_paired_fused_pair, int8_matmul,
    )

    c = cfg
    hd = c.head_dim
    b, s, _ = emb.shape
    mp = params["model"]
    cos, sin = rotary_cos_sin(positions, hd, c.rope_theta)
    cos = cos.astype(compute_dtype)
    sin = sin.astype(compute_dtype)

    x2 = emb.reshape(b * s, c.dim).astype(jnp.float32)  # fp32 residual stream
    l0 = mp["layer_0"]
    qkv = int4_paired_fused_matmul(
        x2.astype(compute_dtype), l0["qkv_proj"]["qp"],
        l0["qkv_proj"]["scale"], gamma=l0["input_norm"]["weight"],
        eps=c.rms_eps,
    )
    new_caches = []
    for i in range(c.layers):
        li = mp[f"layer_{i}"]
        qkv3 = qkv.reshape(b, s, -1).astype(compute_dtype)
        q = apply_rotary(
            qkv3[..., : c.heads * hd].reshape(b, s, c.heads, hd), cos, sin)
        k = apply_rotary(
            qkv3[..., c.heads * hd : hd * (c.heads + c.kv_heads)]
            .reshape(b, s, c.kv_heads, hd), cos, sin)
        v = qkv3[..., hd * (c.heads + c.kv_heads) :].reshape(
            b, s, c.kv_heads, hd)
        out, nc = update_cache_attend(q, k, v, caches[i], cache_index, s)
        new_caches.append(nc)
        out2 = out.reshape(b * s, c.heads * hd).astype(compute_dtype)
        xr, gu = int4_paired_fused_pair(
            out2, li["o_proj"]["qp"], li["o_proj"]["scale"], x2,
            li["post_norm"]["weight"], li["gateup_proj"]["qp"],
            li["gateup_proj"]["scale"], siluglu1=False, eps=c.rms_eps,
        )
        if i + 1 < c.layers:
            ln = mp[f"layer_{i + 1}"]
            x2, qkv = int4_paired_fused_pair(
                gu.astype(compute_dtype), li["down_proj"]["qp"],
                li["down_proj"]["scale"], xr, ln["input_norm"]["weight"],
                ln["qkv_proj"]["qp"], ln["qkv_proj"]["scale"],
                siluglu1=True, eps=c.rms_eps,
            )
        else:
            x2 = int4_paired_fused_matmul(
                gu.astype(compute_dtype), li["down_proj"]["qp"],
                li["down_proj"]["scale"], siluglu=True, residual=xr,
            )

    xf = x2 * jax.lax.rsqrt(jnp.mean(x2 * x2, axis=-1, keepdims=True) + c.rms_eps)
    xf = xf * mp["norm"]["weight"].astype(jnp.float32)
    head = params["lm_head"]
    if "q" in head:  # int8 head
        logits = int8_matmul(xf.astype(compute_dtype), head["q"], head["scale"])
    else:
        logits = jnp.dot(
            xf.astype(compute_dtype),
            head["Dense_0"]["kernel"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    return logits.reshape(b, s, -1).astype(jnp.float32), new_caches
