"""Ring attention vs full attention on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


# ------------------------------------------------------- dispatch + HLO

def test_auto_dispatch_routes_to_ring_and_hlo_has_ppermute():
    """VERDICT round-2 item 6: under sequence_sharding, the auto dispatch
    must route eligible self-attention through the ring kernel, and the
    lowered program must rotate k/v via collective-permute with NO
    full-sequence all-gather (the scaling property checkable without
    hardware)."""
    from supir_tpu.ops.attention import dot_product_attention, sequence_sharding

    mesh = make_mesh((8,), ("seq",))
    b, s, h, d = 1, 256, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))

    want = _xla_attention(q, k, v)

    def run(q, k, v):
        return dot_product_attention(q, k, v, impl="auto")

    with sequence_sharding(mesh, "seq", min_seq=256):
        got = jax.jit(run)(q, k, v)
        lowered = jax.jit(run).lower(q, k, v).as_text()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    assert "collective_permute" in lowered, "ring path not taken"
    assert "all_gather" not in lowered, "full-sequence all-gather leaked in"
    assert "all_to_all" not in lowered


def test_auto_dispatch_ineligible_falls_back():
    """Causal, biased, short, or non-divisible sequences must NOT take the
    ring path even inside the context."""
    from supir_tpu.ops.attention import dot_product_attention, sequence_sharding

    mesh = make_mesh((8,), ("seq",))
    b, s, h, d = 1, 256, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d))

    cases = dict(
        causal=lambda: dot_product_attention(q, q, q, causal=True, impl="auto"),
        biased=lambda: dot_product_attention(
            q, q, q, bias=jnp.zeros((1, h, s, s)), impl="auto"),
        short=lambda: dot_product_attention(
            q[:, :128], q[:, :128], q[:, :128], impl="auto"),
        indivisible=lambda: dot_product_attention(
            q[:, : s - 8 - 4], q[:, : s - 8 - 4], q[:, : s - 8 - 4], impl="auto"),
    )
    with sequence_sharding(mesh, "seq", min_seq=256):
        for name, fn in cases.items():
            lowered = jax.jit(fn).lower().as_text()
            assert "collective_permute" not in lowered, name


@pytest.mark.heavy
def test_engine_sequence_mesh_routes_through_ring(monkeypatch):
    """End-to-end wiring (VERDICT round-2 item 6): the engine's network path
    (GLVControl + UNet through the ops dispatch) lowers with
    collective_permute when a sequence mesh is active — and the full
    batchify_sample executes finitely with set_sequence_mesh on the 8-CPU
    mesh."""
    from supir_tpu.engine.factory import create_engine, tiny_test_config
    from supir_tpu.ops.attention import sequence_sharding

    monkeypatch.setenv("SUPIR_RING_MIN_SEQ", "16")
    cfg, cond_cfg = tiny_test_config()
    eng = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    mesh = make_mesh((8,), ("seq",))

    k = jax.random.PRNGKey(3)
    tok = jax.random.randint(k, (1, 77), 0, 49408)
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 0.3, -1, 1)
    z = eng.encode_first_stage_with_denoise(x)
    c, uc = eng.prepare_condition(z, tok, tok, tok, tok)

    # HLO assert on the network path (what the sampler traces per step).
    # NB: fresh closures per lowering — jax caches traces by function
    # identity, so reusing one `net` would replay the no-ring trace.
    def make_net():
        def net(params, zz, t):
            cond = {"crossattn": c["crossattn"], "vector": c["vector"],
                    "control": c["control"]}
            return eng._network(params, zz, t, cond, jnp.float32(1.0))

        return net

    t = jnp.zeros((1,), jnp.float32)
    base = jax.jit(make_net()).lower(eng.params, z, t).as_text()
    assert "collective_permute" not in base
    with sequence_sharding(mesh, "seq", min_seq=16):
        ringed = jax.jit(make_net()).lower(eng.params, z, t).as_text()
    assert "collective_permute" in ringed

    # execution: full sampler with the sequence mesh set on the engine
    eng.set_sequence_mesh(mesh, "seq")
    samples = eng.batchify_sample(x, c, uc, num_steps=2, seed=0)
    assert np.isfinite(np.asarray(samples)).all()
