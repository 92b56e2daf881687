"""Attention dispatch: one entry point for every attention site.

The reference repo has four attention backends (xformers, torch SDPA, a
Triton flash kernel, flash-attn pkg — SURVEY.md section 2.5). Here there is
exactly one API; the backend is chosen by `impl`:

  - "xla": jnp einsum softmax (always available; XLA fuses it well on TPU
    for moderate sequence lengths)
  - "flash": Pallas blockwise flash-attention kernel (TPU only; falls back
    to xla on other backends)

Shapes follow the TPU-friendly convention [B, S, H, D] (batch, seq, heads,
head_dim) — head_dim last, so the MXU contraction is over the minor dim.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp

# Active sequence-sharding context: (mesh, axis_name) or None. When set via
# `sequence_sharding`, the auto dispatch routes big self-attention sites
# through parallel/ring_attention so the sequence itself shards over the
# mesh axis (SURVEY.md section 5 long-context: 8K+ imagery where one tile's
# tokens exceed a chip).
_SEQ_SHARD: list = [None]


@contextlib.contextmanager
def sequence_sharding(mesh, axis: str = "seq", min_seq: int | None = None):
    """Route eligible attention through the ring kernel while active.

    Eligible = self-attention (same q/k length), no bias, not causal,
    S divisible by the axis size, and S >= min_seq (default
    SUPIR_RING_MIN_SEQ or 8192 — below that a single chip's flash kernel
    wins; ppermute latency only pays off once the sequence cannot fit)."""
    import os

    if min_seq is None:
        min_seq = int(os.environ.get("SUPIR_RING_MIN_SEQ", "8192"))
    prev = _SEQ_SHARD[0]
    _SEQ_SHARD[0] = (mesh, axis, min_seq)
    try:
        yield
    finally:
        _SEQ_SHARD[0] = prev


def _ring_eligible(q, k, bias, causal):
    ctx = _SEQ_SHARD[0]
    if ctx is None or bias is not None or causal:
        return None
    mesh, axis, min_seq = ctx
    s = q.shape[1]
    if s != k.shape[1] or s < min_seq or s % mesh.shape[axis]:
        return None
    return mesh, axis


def _xla_attention(q, k, v, bias=None, causal=False):
    """[B, S, H, D] x [B, T, H, D] -> [B, S, H, D], fp32 softmax accumulation."""
    orig_dtype = q.dtype
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        s, t = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((s, t), jnp.bool_), k=t - s)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1).astype(orig_dtype)
    return jnp.einsum("bhst,bthd->bshd", weights, v)


def dot_product_attention(q, k, v, bias=None, causal=False, impl="auto",
                          alibi_slopes=None):
    """Scaled dot-product attention over [B, S, H, D] tensors.

    impl="auto" uses the Pallas flash kernel on TPU for long sequences and
    plain XLA otherwise. SUPIR_ATTN_IMPL=xla|flash overrides "auto";
    SUPIR_FLASH_MIN_SEQ moves the crossover. Measured on v5e (full SUPIR
    pipeline, 1024px 50 steps): all-XLA 12.08 s, flash>=2048 10.11 s,
    flash>=1024 (default) 9.07 s — 8.82 s with the head-packed kernel.
    """
    if impl == "auto":
        import os

        ring = _ring_eligible(q, k, bias, causal)
        if ring is not None:
            from supir_tpu.parallel.ring_attention import ring_attention

            return ring_attention(q, k, v, ring[0], axis=ring[1])

        forced = os.environ.get("SUPIR_ATTN_IMPL")
        if forced in ("xla", "flash"):
            impl = forced
        else:
            min_seq = int(os.environ.get("SUPIR_FLASH_MIN_SEQ", "1024"))
            # NOTE: routing short-kv cross-attention (77 text tokens) through
            # the kernel was tried and measured SLOWER e2e (188.8 vs 176.3
            # ms/step): per-launch overhead beats the saved fp32 softmax
            # round-trip. Keep the kernel for long-kv self-attention only.
            use_flash = (
                jax.default_backend() == "tpu"
                and q.shape[1] >= min_seq
                and k.shape[1] >= min_seq
                and q.shape[-1] <= 128
            )
            impl = "flash" if use_flash else "xla"
    if impl == "flash":
        from supir_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, bias=bias, causal=causal, alibi_slopes=alibi_slopes
        )
    if alibi_slopes is not None:
        # materialize the MPT column bias [1, H, 1, T]
        t = k.shape[1]
        col = jnp.arange(t, dtype=jnp.float32) - (t - 1)
        ab = jnp.asarray(alibi_slopes, jnp.float32)[None, :, None, None] * col
        bias = ab if bias is None else bias + ab
    return _xla_attention(q, k, v, bias=bias, causal=causal)
