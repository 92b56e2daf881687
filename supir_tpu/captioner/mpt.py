"""MPT decoder variant for the captioner (llava-mpt family).

Behavioral contract: `llava/model/language_model/mpt/` — MPTModel
(modeling_mpt.py:33) with ALiBi positional bias (attention.py:292), pre-LN
blocks without biases, optional MultiQuery attention (attention.py:204),
and low-precision LayerNorm (norm.py). The reference ships a Triton flash
kernel for this path (flash_attn_triton.py:51-497); here the same Pallas
flash attention kernel used everywhere else serves it (ALiBi enters as an
additive bias, which the dispatch routes through the XLA path; a fused
ALiBi flash variant is a later optimization).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.models.layers import Dense
from supir_tpu.ops import dot_product_attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class MPTConfig:
    vocab_size: int = 50432
    d_model: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    multiquery: bool = False
    alibi_bias_max: float = 8.0
    max_seq_len: int = 2048

    @property
    def head_dim(self):
        return self.d_model // self.n_heads

    def tiny(self) -> "MPTConfig":
        return dataclasses.replace(
            self, vocab_size=128, d_model=64, n_layers=2, n_heads=4, max_seq_len=64
        )


def alibi_slopes(n_heads: int, bias_max: float = 8.0) -> np.ndarray:
    """[H] ALiBi slopes, MPT convention: 1/2^(i*bias_max/ceil_pow2(H)); when
    H is not a power of two the odd slopes are interleaved
    (reference attention.py:292-311)."""
    ceil_p2 = 2 ** math.ceil(math.log2(n_heads))
    m = np.arange(1, ceil_p2 + 1, dtype=np.float32) * bias_max / ceil_p2
    slopes = 1.0 / (2.0**m)
    if ceil_p2 != n_heads:
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return slopes.astype(np.float32)


def build_alibi_bias(n_heads: int, seq_len: int, bias_max: float = 8.0) -> np.ndarray:
    """[1, H, 1, S] ALiBi slopes*distance (reference attention.py:292-311)."""
    dist = np.arange(1 - seq_len, 1, dtype=np.float32)[None, None, None, :]
    slopes = alibi_slopes(n_heads, bias_max)
    return (dist * slopes[None, :, None, None]).astype(np.float32)


class LPLayerNorm(nn.Module):
    """Low-precision LayerNorm: params downcast to activation dtype, stats
    in fp32 (reference norm.py)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(
            use_bias=True, dtype=jnp.float32, param_dtype=jnp.float32, name="ln"
        )(x.astype(jnp.float32)).astype(self.dtype)


class MPTBlock(nn.Module):
    cfg: MPTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, alibi_bias, cache=None, cache_index=None):
        c = self.cfg
        hd = c.head_dim
        b, s, _ = x.shape
        kv_heads = 1 if c.multiquery else c.n_heads

        h = LPLayerNorm(dtype=self.dtype, name="norm_1")(x)
        qkv_dim = c.d_model + 2 * kv_heads * hd
        qkv = Dense(qkv_dim, use_bias=False, dtype=self.dtype, name="Wqkv")(h)
        q = qkv[..., : c.d_model].reshape(b, s, c.n_heads, hd)
        k = qkv[..., c.d_model : c.d_model + kv_heads * hd].reshape(b, s, kv_heads, hd)
        v = qkv[..., c.d_model + kv_heads * hd :].reshape(b, s, kv_heads, hd)
        if cache is not None:
            # static-shape KV cache (decode): append at cache_index, attend
            # over valid causal prefix with the shift-invariant ALiBi column
            # bias (softmax per-row constant offsets cancel, which is also
            # why the reference can use one [1,H,1,S] bias for all rows,
            # attention.py:292-311)
            ck, cv = cache  # [B, L, KVH, D]
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
            new_cache = (ck, cv)
            k_all, v_all = ck, cv
            if c.multiquery:
                lcache = ck.shape[1]
                k_all = jnp.broadcast_to(ck, (b, lcache, c.n_heads, hd))
                v_all = jnp.broadcast_to(cv, (b, lcache, c.n_heads, hd))
            if isinstance(cache_index, int) and cache_index == 0:
                # prefill fast path: nothing precedes these s tokens, and the
                # ALiBi column bias is shift-invariant under softmax, so the
                # fused-ALiBi causal kernel over the fresh k/v is exact —
                # skips the [B, H, s, cache_len] bias materialization
                kf, vf = k_all[:, :s], v_all[:, :s]
                out = dot_product_attention(
                    q, kf, vf, causal=True,
                    alibi_slopes=alibi_slopes(c.n_heads, c.alibi_bias_max),
                )
            else:
                lcache = ck.shape[1]
                col = jnp.arange(lcache)[None, None, None, :]
                row = jnp.arange(s)[None, None, :, None] + cache_index
                valid = (col < (cache_index + s)) & (col <= row)
                bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)
                bias = bias + alibi_bias  # [1,H,1,L] column bias
                out = dot_product_attention(q, k_all, v_all, bias=bias, impl="xla")
        else:
            new_cache = None
            if c.multiquery:
                k = jnp.broadcast_to(k, (b, s, c.n_heads, hd))
                v = jnp.broadcast_to(v, (b, s, c.n_heads, hd))
            # fused-ALiBi path: slopes enter the flash kernel directly, no
            # [1,H,1,S] bias materialization (no XLA fallback)
            out = dot_product_attention(
                q, k, v, causal=True,
                alibi_slopes=alibi_slopes(c.n_heads, c.alibi_bias_max),
            )
        x = x + Dense(c.d_model, use_bias=False, dtype=self.dtype, name="out_proj")(
            out.reshape(b, s, c.d_model)
        )

        h = LPLayerNorm(dtype=self.dtype, name="norm_2")(x)
        h = Dense(4 * c.d_model, use_bias=False, dtype=self.dtype, name="up_proj")(h)
        h = nn.gelu(h)
        return x + Dense(c.d_model, use_bias=False, dtype=self.dtype, name="down_proj")(h), new_cache


class MPTForCausalLM(nn.Module):
    """Tied-embedding MPT causal LM (reference modeling_mpt.py:232-330),
    with a static-shape KV cache for autoregressive decode."""

    cfg: MPTConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.wte = nn.Embed(
            c.vocab_size, c.d_model, dtype=self.dtype, param_dtype=jnp.float32,
            name="wte",
        )
        self.blocks = [
            MPTBlock(c, dtype=self.dtype, name=f"block_{i}") for i in range(c.n_layers)
        ]
        self.norm_f = LPLayerNorm(dtype=self.dtype, name="norm_f")

    def embed(self, ids):
        return self.wte(ids)

    def forward_embeds(self, x, caches=None, cache_index=None):
        """Embeddings in (LLaVA-MPT splices image patches), logits out."""
        c = self.cfg
        if caches is not None:
            bias_len = caches[0][0].shape[1]
        else:
            bias_len = x.shape[1]
        alibi = jnp.asarray(build_alibi_bias(c.n_heads, bias_len, c.alibi_bias_max))
        new_caches = []
        for i, blk in enumerate(self.blocks):
            cache_i = None if caches is None else caches[i]
            x, nc = blk(x, alibi, cache=cache_i, cache_index=cache_index)
            new_caches.append(nc)
        x = self.norm_f(x)
        logits = self.wte.attend(x.astype(jnp.float32))  # tied lm head
        return logits, (new_caches if caches is not None else None)

    def __call__(self, ids, caches=None, cache_index=None):
        logits, new_caches = self.forward_embeds(self.wte(ids), caches, cache_index)
        if caches is None:
            return logits
        return logits, new_caches

    def init_cache(self, batch: int, length: int, dtype=jnp.float32):
        c = self.cfg
        kv_heads = 1 if c.multiquery else c.n_heads
        return [
            (
                jnp.zeros((batch, length, kv_heads, c.head_dim), dtype),
                jnp.zeros((batch, length, kv_heads, c.head_dim), dtype),
            )
            for _ in range(c.n_layers)
        ]


def mpt_generate(
    model: MPTForCausalLM,
    params,
    ids: jnp.ndarray,
    max_new_tokens: int = 64,
    cache_len: Optional[int] = None,
    temperature: float = 0.0,
    eos_id: int = 0,
    seed: int = 0,
):
    """Autoregressive decode with the static KV cache (the capability the
    reference gets from HF generate over MPTForCausalLM.forward,
    modeling_mpt.py:232-330). Greedy when temperature == 0."""
    b, plen = ids.shape
    cache_len = cache_len or (plen + max_new_tokens)
    assert plen + max_new_tokens <= cache_len
    caches = model.init_cache(b, cache_len)

    prefill = jax.jit(
        lambda p, i, c: model.apply({"params": p}, i, caches=c, cache_index=0)
    )

    def _step(p, tok, pos, c, rng, temp):
        logits, c = model.apply({"params": p}, tok[:, None], caches=c, cache_index=pos)
        logits = logits[:, -1]

        def sample(rng):
            return jax.random.categorical(rng, logits / jnp.maximum(temp, 1e-4))

        tok = jax.lax.cond(
            temp > 0.0, sample, lambda _: jnp.argmax(logits, axis=-1), rng
        )
        return tok, c

    step = jax.jit(_step)

    logits, caches = prefill(params, ids, caches)
    tok = jnp.argmax(logits[:, -1], axis=-1)
    rng = jax.random.PRNGKey(seed)
    outs = [np.asarray(tok)]
    done = np.asarray(tok) == eos_id
    for i in range(max_new_tokens - 1):
        rng, sub = jax.random.split(rng)
        tok, caches = step(
            params, tok, jnp.asarray(plen + i, jnp.int32), caches, sub,
            jnp.float32(temperature),
        )
        t_host = np.asarray(tok)
        outs.append(t_host)
        done |= t_host == eos_id
        if done.all():
            break
    return np.stack(outs, axis=1)
