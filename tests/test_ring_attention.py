"""Ring attention vs full attention on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.ops.attention import _xla_attention
from supir_tpu.parallel.mesh import make_mesh
from supir_tpu.parallel.ring_attention import ring_attention


def test_ring_matches_full():
    mesh = make_mesh((1, 4, 1), ("data", "tile", "model"))
    b, s, h, d = 2, 64, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    want = _xla_attention(q, k, v)
    got = ring_attention(q, k, v, mesh, axis="tile")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_eight_way():
    mesh = make_mesh((8,), ("tile",))
    b, s, h, d = 1, 128, 2, 8
    q = jax.random.normal(jax.random.PRNGKey(3), (b, s, h, d))
    want = _xla_attention(q, q, q)
    got = ring_attention(q, q, q, mesh, axis="tile")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
