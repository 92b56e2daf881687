"""Fused GN+SiLU Pallas kernel vs flax reference (interpret mode)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supir_tpu.ops.groupnorm import group_norm_silu


def _ref(x, gamma, beta, groups, eps, silu=True):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps)
    out = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    return jax.nn.silu(out) if silu else out


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 64), 32),      # aligned rows
    ((1, 7, 9, 64), 16),      # ragged rows vs block
    ((2, 300, 32), 8),        # token layout [B, N, C]
])
def test_gn_silu_matches_flax(shape, groups, rng):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 2 + 0.5
    c = shape[-1]
    gamma = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    want = _ref(x, gamma, beta, groups, 1e-5)
    got = group_norm_silu(x, gamma, beta, groups=groups, eps=1e-5,
                          block_rows=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gn_no_silu(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 32)).astype(np.float32))
    gamma = jnp.ones(32)
    beta = jnp.zeros(32)
    want = _ref(x, gamma, beta, 32, 1e-6, silu=False)
    got = group_norm_silu(x, gamma, beta, groups=32, eps=1e-6,
                          apply_silu=False, block_rows=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gn_bf16(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 64)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    gamma = jnp.ones(64)
    beta = jnp.zeros(64)
    want = _ref(x, gamma, beta, 32, 1e-5)
    got = group_norm_silu(xb, gamma, beta, groups=32, block_rows=256, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=3e-2
    )
