"""Int8 quantization: reconstruction error, matmul path, tree sweep."""

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.ops.quantize import int8_matmul, quantize_int8, quantize_tree_int8


def test_quantize_roundtrip_error(rng):
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    q, scale = quantize_int8(w, interpret=True)
    assert q.dtype == jnp.int8 and scale.shape == (1, 32)
    deq = q.astype(jnp.float32) * scale
    err = np.abs(np.asarray(deq - w)).max()
    # per-channel absmax/127 quantization step bound
    step = np.asarray(scale).max()
    assert err <= step * 0.51 + 1e-6


def test_int8_matmul_close(rng):
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    q, scale = quantize_int8(w, interpret=True)
    got = int8_matmul(x, q, scale)
    want = x @ w
    rel = np.abs(np.asarray(got - want)).mean() / np.abs(np.asarray(want)).mean()
    assert rel < 0.02, rel


def test_quantize_tree(rng):
    params = {
        "a": {"kernel": jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))},
        "bias": jnp.zeros(16),
    }
    qtree, saved = quantize_tree_int8(params)
    assert isinstance(qtree["a"]["kernel"], dict)
    assert qtree["a"]["kernel"]["q"].dtype == jnp.int8
    assert qtree["bias"].dtype == jnp.float32
    assert saved > 0
