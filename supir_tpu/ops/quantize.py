"""Int8 weight quantization (Pallas) — the TPU stand-in for the
reference's bitsandbytes 8-bit LLaVA loading (llava/model/builder.py:29-38).

Per-channel symmetric int8: w ~ scale[c] * q[c], quantized with stochastic
rounding on-device; matmul dequantizes on the fly (int8 weights halve HBM
traffic for the memory-bound decode of the 13B captioner).
"""

from __future__ import annotations

import functools

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

    Per-out-channel symmetric int4 in [-7, 7], two values packed per byte
    along the contraction dim — the TPU analogue of bitsandbytes 4-bit
    loading (reference llava/model/builder.py:29-38). `in` must be even.
    """
    assert w.shape[0] % 2 == 0, "int4 packing needs an even contraction dim"
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = (absmax / 7.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / jnp.maximum(scale, 1e-12)), -7, 7).astype(jnp.int8)
    qu = (q & 0xF).astype(jnp.uint8)
    packed = qu[0::2] | (qu[1::2] << 4)
    return packed, scale


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """packed uint8 [in//2, out] -> int8 [in, out] in [-7, 7]."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    sx = lambda u: (u ^ 8) - 8  # sign-extend 4-bit two's complement
    half, out = packed.shape
    return jnp.stack([sx(lo), sx(hi)], axis=1).reshape(half * 2, out)


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray):
    """x [B, in] @ dequant(packed) -> [B, out]; weights stay 4-bit in HBM,
    the unpack fuses into the matmul prologue."""
    q = unpack_int4(packed)
    y = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
    return y * scale.astype(jnp.float32)


def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray):
    """x [B, in] @ dequant(q) -> [B, out]; dequant fused into the matmul
    epilogue by XLA (int8 weights stay int8 in HBM)."""
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
