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
    # prefix-LM mode (reference attn_config['prefix_lm'] +
    # hf_prefixlm_converter.py): positions flagged in `prefix_mask` attend
    # BIDIRECTIONALLY; the rest stay causal. ALiBi becomes the full
    # symmetric -|i-j|*slope bias (attention.py build_alibi_bias full=True)
    prefix_lm: bool = False

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


def build_alibi_bias_full(n_heads: int, seq_len: int,
                          bias_max: float = 8.0) -> np.ndarray:
    """[1, H, S, S] symmetric ALiBi -|i-j|*slope — the prefix-LM form
    (reference attention.py build_alibi_bias with full=True: rows can
    attend forward inside the prefix, so distance must be symmetric)."""
    pos = np.arange(seq_len, dtype=np.float32)
    dist = -np.abs(pos[None, :] - pos[:, None])[None, None]  # [1,1,S,S]
    slopes = alibi_slopes(n_heads, bias_max)
    return (dist * slopes[None, :, None, None]).astype(np.float32)


def prefix_lm_bias(cfg: "MPTConfig", prefix_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, S] additive attention bias for prefix-LM mode: full ALiBi
    plus -inf where NOT (causal OR key-position-in-prefix) — the exact
    masking of the reference's MPTModel._apply_prefix_mask
    (modeling_mpt.py:119-131)."""
    b, s = prefix_mask.shape
    alibi = jnp.asarray(build_alibi_bias_full(cfg.n_heads, s, cfg.alibi_bias_max))
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None]          # [1,1,S,S]
    prefix = prefix_mask.astype(bool)[:, None, None, :]             # [B,1,1,S]
    can_attend = jnp.logical_or(causal, prefix)
    return jnp.where(can_attend, alibi, -1e30).astype(jnp.float32)


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
    def __call__(self, x, alibi_bias, cache=None, cache_index=None,
                 attn_bias=None):
        """`attn_bias` [B|1, H, S, S]: full additive bias overriding the
        causal-ALiBi fast path (prefix-LM mode); no-cache path only."""
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
            if attn_bias is not None:
                # prefix-LM: the bias carries both the full ALiBi and the
                # (causal | prefix) mask; not flash-eligible (arbitrary mask)
                out = dot_product_attention(q, k, v, bias=attn_bias, impl="xla")
            else:
                # fused-ALiBi path: slopes enter the flash kernel directly,
                # no [1,H,1,S] bias materialization (no XLA fallback)
                out = dot_product_attention(
                    q, k, v, causal=True,
                    alibi_slopes=alibi_slopes(c.n_heads, c.alibi_bias_max),
                )
        x = x + Dense(c.d_model, use_bias=False, dtype=self.dtype, name="out_proj")(
            out.reshape(b, s, c.d_model)
        )

        h = LPLayerNorm(dtype=self.dtype, name="norm_2")(x)
        h = Dense(4 * c.d_model, use_bias=False, dtype=self.dtype, name="up_proj")(h)
        h = nn.gelu(h, approximate=False)  # ref blocks.py:13 GELU(approximate='none')
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

    def forward_embeds(self, x, caches=None, cache_index=None,
                       prefix_mask=None):
        """Embeddings in (LLaVA-MPT splices image patches), logits out.

        `prefix_mask` [B, S] (prefix-LM mode, cfg.prefix_lm): 1 marks
        positions of the bidirectional prefix; requires caches=None (the
        reference likewise only feeds prefix_mask through the no-cache
        forward; its generate path re-prefills, modeling_mpt.py:306-319)."""
        c = self.cfg
        if prefix_mask is not None:
            if not c.prefix_lm:
                raise ValueError("prefix_mask requires MPTConfig.prefix_lm=True")
            if caches is not None:
                raise ValueError("prefix-LM mode does not support the KV cache path")
            bias = prefix_lm_bias(c, prefix_mask)
            new_caches = []
            for blk in self.blocks:
                x, _ = blk(x, None, attn_bias=bias)
            x = self.norm_f(x)
            return self.wte.attend(x.astype(jnp.float32)), None
        if c.prefix_lm:
            # unconditional like the reference (modeling_mpt.py:158-159):
            # a prefix-LM model driven through the cached generate path
            # would otherwise silently prefill fully causally — wrong
            # bidirectional-prefix hidden states with no error
            raise ValueError(
                "prefix_mask is required when MPT is configured with "
                "prefix_lm=True (and the KV-cache path does not support "
                "prefix-LM; re-prefill instead, modeling_mpt.py:306-319)"
            )
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

    def __call__(self, ids, caches=None, cache_index=None, prefix_mask=None):
        logits, new_caches = self.forward_embeds(
            self.wte(ids), caches, cache_index, prefix_mask=prefix_mask
        )
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


# --------------------------------------------------------------- init fns
#
# The reference ships a family of from-scratch init schemes selected by
# config.init_config['name'] (param_init_fns.py:10-181, MODEL_INIT_REGISTRY).
# This is the subset applicable to the no-bias MPT built here, with the
# same semantics: per-scheme linear-weight init, fused-Wqkv per-split init
# (fused_init_helper_, :17-27), residual projections (attn.out_proj,
# ffn.down_proj) divided by sqrt(2*n_layers) (generic_param_init_fn_
# init_div_is_residual, :33-56), embeddings via emb_init_std or the
# scheme's fn, norms to ones/zeros.


def _init_linear(rng: np.random.Generator, fan_in: int, fan_out: int,
                 name: str, d_model: int, init_std=None, init_gain: float = 0.0):
    """One [fan_in, fan_out] kernel under the named scheme (torch fan
    conventions: weight is [out, in], fan_in = in features)."""
    shape = (fan_in, fan_out)
    if name == "default_":
        # torch nn.Linear.reset_parameters: kaiming_uniform(a=sqrt(5))
        bound = 1.0 / math.sqrt(fan_in)
        return rng.uniform(-bound, bound, shape).astype(np.float32)
    if name in ("baseline_",):
        if init_std is None:
            raise ValueError(
                "init_config['init_std'] must be set for baseline_ init"
            )
        return rng.normal(0.0, init_std, shape).astype(np.float32)
    if name in ("small_init_", "neox_init_"):
        std = math.sqrt(2.0 / (5.0 * d_model))
        return rng.normal(0.0, std, shape).astype(np.float32)
    if name == "kaiming_uniform_":
        # gain = sqrt(2/(1+a^2)), a=init_gain; bound = sqrt(3)*gain/sqrt(fan_in)
        gain = math.sqrt(2.0 / (1.0 + init_gain**2))
        bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
        return rng.uniform(-bound, bound, shape).astype(np.float32)
    if name == "kaiming_normal_":
        gain = math.sqrt(2.0 / (1.0 + init_gain**2))
        return rng.normal(0.0, gain / math.sqrt(fan_in), shape).astype(np.float32)
    if name == "xavier_uniform_":
        bound = init_gain * math.sqrt(6.0 / (fan_in + fan_out))
        return rng.uniform(-bound, bound, shape).astype(np.float32)
    if name == "xavier_normal_":
        std = init_gain * math.sqrt(2.0 / (fan_in + fan_out))
        return rng.normal(0.0, std, shape).astype(np.float32)
    raise KeyError(f"unknown init scheme {name!r}")


MODEL_INIT_REGISTRY = (
    "default_", "baseline_", "kaiming_uniform_", "kaiming_normal_",
    "neox_init_", "small_init_", "xavier_uniform_", "xavier_normal_",
)


def init_mpt_params(
    cfg: MPTConfig,
    seed: int = 0,
    name: str = "kaiming_normal_",
    init_std: Optional[float] = None,
    emb_init_std: Optional[float] = None,
    init_div_is_residual=True,
    init_gain: float = 0.0,
):
    """Build an MPTForCausalLM param tree under a named init scheme."""
    if name not in MODEL_INIT_REGISTRY:
        raise KeyError(f"unknown init scheme {name!r}; registry: {MODEL_INIT_REGISTRY}")
    rng = np.random.default_rng(seed)
    c = cfg
    kv_heads = 1 if c.multiquery else c.n_heads

    # residual divisor (generic_param_init_fn_:33-47); neox uses
    # n_layers/sqrt(10) (neox_param_init_fn_:142-155)
    if name == "neox_init_":
        div = c.n_layers / math.sqrt(10.0)
    elif init_div_is_residual is True:
        div = math.sqrt(2.0 * c.n_layers)
    elif init_div_is_residual is False or name == "default_":
        div = 1.0
    else:
        div = float(init_div_is_residual)
    if name == "default_":
        div = 1.0  # torch default reset has no residual scaling

    def lin(fan_in, fan_out, residual=False, fused_splits=None):
        if fused_splits:
            # fused_init_helper_: each split initialized independently
            parts, prev = [], 0
            for e in list(fused_splits) + [fan_out]:
                parts.append(_init_linear(rng, fan_in, e - prev, name,
                                          c.d_model, init_std, init_gain))
                prev = e
            w = np.concatenate(parts, axis=1)
        else:
            w = _init_linear(rng, fan_in, fan_out, name, c.d_model,
                             init_std, init_gain)
        if residual and div != 1.0:
            w = w / div
        return {"Dense_0": {"kernel": jnp.asarray(w)}}

    def norm():
        return {"ln": {"scale": jnp.ones((c.d_model,), jnp.float32),
                       "bias": jnp.zeros((c.d_model,), jnp.float32)}}

    if emb_init_std is not None:
        emb = rng.normal(0.0, emb_init_std, (c.vocab_size, c.d_model))
    elif name == "default_":
        emb = rng.normal(0.0, 1.0, (c.vocab_size, c.d_model))
    else:
        emb = _init_linear(rng, c.d_model, c.vocab_size, name, c.d_model,
                           init_std, init_gain).T
    params = {"wte": {"embedding": jnp.asarray(emb, jnp.float32)}}
    qkv_out = c.d_model + 2 * kv_heads * c.head_dim
    for i in range(c.n_layers):
        params[f"block_{i}"] = {
            "norm_1": norm(),
            "Wqkv": lin(c.d_model, qkv_out,
                        fused_splits=(c.d_model, c.d_model + kv_heads * c.head_dim)),
            "out_proj": lin(c.d_model, c.d_model, residual=True),
            "norm_2": norm(),
            "up_proj": lin(c.d_model, 4 * c.d_model),
            "down_proj": lin(4 * c.d_model, c.d_model, residual=True),
        }
    params["norm_f"] = norm()
    return params


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
