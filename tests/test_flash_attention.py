"""Pallas flash attention vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supir_tpu.ops.attention import _xla_attention
from supir_tpu.ops.flash_attention import flash_attention


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize(
    "s,t",
    [
        (256, 256),   # self-attention, block-aligned
        (300, 300),   # ragged: padding mask must be exact
        (256, 77),    # cross-attention with short kv (text tokens)
        (64, 640),    # more kv blocks than q blocks
    ],
)
def test_flash_matches_xla(s, t):
    b, h, d = 2, 3, 64
    q, k, v = _rand(0, (b, s, h, d)), _rand(1, (b, t, h, d)), _rand(2, (b, t, h, d))
    want = _xla_attention(q, k, v)
    got = flash_attention(q, k, v, bq=128, bkv=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_causal_matches_xla():
    b, s, h, d = 1, 200, 2, 64
    q, k, v = _rand(3, (b, s, h, d)), _rand(4, (b, s, h, d)), _rand(5, (b, s, h, d))
    want = _xla_attention(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, bq=64, bkv=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_bf16():
    b, s, h, d = 1, 128, 2, 64
    q = _rand(6, (b, s, h, d)).astype(jnp.bfloat16)
    k = _rand(7, (b, s, h, d)).astype(jnp.bfloat16)
    v = _rand(8, (b, s, h, d)).astype(jnp.bfloat16)
    want = _xla_attention(q, k, v).astype(jnp.float32)
    got = flash_attention(q, k, v, bq=128, bkv=128, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_flash_alibi_matches_xla():
    """Fused-ALiBi kernel path == XLA with materialized column bias."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from supir_tpu.captioner.mpt import alibi_slopes
    from supir_tpu.ops.attention import dot_product_attention
    from supir_tpu.ops.flash_attention import flash_attention

    b, s, h, d = 2, 48, 6, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    slopes = alibi_slopes(h)

    ref = dot_product_attention(q, k, v, causal=True, impl="xla",
                                alibi_slopes=slopes)
    out = flash_attention(q, k, v, causal=True, alibi_slopes=slopes,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_alibi_noncausal_matches_xla():
    import jax
    import numpy as np

    from supir_tpu.captioner.mpt import alibi_slopes
    from supir_tpu.ops.attention import dot_product_attention
    from supir_tpu.ops.flash_attention import flash_attention

    b, s, h, d = 1, 32, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    slopes = alibi_slopes(h)
    ref = dot_product_attention(q, k, v, impl="xla", alibi_slopes=slopes)
    out = flash_attention(q, k, v, alibi_slopes=slopes, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_packed_head_groups():
    """The head-group-packed path (even heads x d=64 -> 128-lane blocks) must
    match XLA with masking (ragged kv) and causal diagonals."""
    b, h, d = 2, 4, 64
    for s, t, causal in [(256, 256, False), (256, 200, False), (250, 250, True)]:
        q, k, v = _rand(10, (b, s, h, d)), _rand(11, (b, t, h, d)), _rand(12, (b, t, h, d))
        want = _xla_attention(q, k, v, causal=causal)
        got = flash_attention(q, k, v, causal=causal, bq=128, bkv=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_flash_adaptive_block_defaults():
    """bq/bkv=None picks shape-adaptive blocks; result must not depend on them."""
    b, h, d = 1, 2, 64
    q, k, v = _rand(13, (b, 300, h, d)), _rand(14, (b, 300, h, d)), _rand(15, (b, 300, h, d))
    a = flash_attention(q, k, v, interpret=True)
    bref = flash_attention(q, k, v, bq=64, bkv=128, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bref), atol=2e-3)


def test_flash_single_kv_block_specialization():
    """When the whole key range fits one kv block the specialized
    closed-form-softmax kernel runs (no online-softmax scratch); outputs
    must match the multi-block kernel and XLA, incl. ragged + causal."""
    b, h, d = 2, 4, 64
    for s, t, causal in [(256, 256, False), (256, 230, False), (256, 256, True)]:
        q, k, v = _rand(20, (b, s, h, d)), _rand(21, (b, t, h, d)), _rand(22, (b, t, h, d))
        want = _xla_attention(q, k, v, causal=causal)
        one = flash_attention(q, k, v, causal=causal, bq=128, bkv=256, interpret=True)
        multi = flash_attention(q, k, v, causal=causal, bq=128, bkv=128, interpret=True)
        np.testing.assert_allclose(np.asarray(one), np.asarray(want), atol=2e-3)
        np.testing.assert_allclose(np.asarray(one), np.asarray(multi), atol=2e-3)
