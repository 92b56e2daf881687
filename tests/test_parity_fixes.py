"""Round-2 parity fixes: Brownian-tree noise, RestoreDPMPP2M step-0
behavior, middle-block trainability, progressive masks."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.config import SamplerConfig
from supir_tpu.diffusion import samplers as S
import pytest


# ---------------------------------------------------------------- Brownian

def test_vbt_increments_are_additive_and_deterministic():
    key = jax.random.PRNGKey(7)
    shape = (4, 4)
    t0, t1 = 0.1, 10.0
    wa = S.vbt_value(key, 2.0, t0, t1, shape)
    wb = S.vbt_value(key, 5.0, t0, t1, shape)
    wc = S.vbt_value(key, 9.0, t0, t1, shape)
    # consistency: increments over adjacent intervals sum exactly
    np.testing.assert_allclose(
        np.asarray((wb - wa) + (wc - wb)), np.asarray(wc - wa), atol=1e-6
    )
    # determinism: same (key, t) -> same value regardless of other queries
    wb2 = S.vbt_value(key, 5.0, t0, t1, shape)
    np.testing.assert_array_equal(np.asarray(wb), np.asarray(wb2))
    # endpoint pinning
    w_t0 = S.vbt_value(key, t0, t0, t1, shape)
    np.testing.assert_allclose(np.asarray(w_t0), 0.0, atol=1e-5)


def test_vbt_increment_distribution_unit_variance():
    key = jax.random.PRNGKey(3)
    shape = (4096,)
    eps = S.brownian_increment(key, 7.0, 3.0, 0.1, 14.6, shape)
    e = np.asarray(eps)
    assert abs(e.mean()) < 0.1
    assert abs(e.std() - 1.0) < 0.1


def test_vbt_step_count_invariance():
    """The property the reference buys with BrownianTreeNoiseSampler: the
    noise drawn for a given (sigma, sigma_next) pair does not depend on what
    other steps exist in the schedule."""
    key = jax.random.PRNGKey(11)
    shape = (8, 8)
    a = S.brownian_increment(key, 7.0, 5.0, 0.1, 14.6, shape)
    # evaluate the same interval after unrelated queries (different schedule)
    _ = S.brownian_increment(key, 12.0, 9.0, 0.1, 14.6, shape)
    b = S.brownian_increment(key, 7.0, 5.0, 0.1, 14.6, shape)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --------------------------------------------------- DPM++2M SDE step 0

def _tables(n, eta_cfg=None):
    cfg = SamplerConfig(s_churn=0.0, restore_cfg=0.0)
    return S.restore_dpmpp2m_tables(cfg, n)


def test_restore_dpmpp2m_step0_injects_no_noise():
    """Reference sampling.py:471-474: first step returns x_standard before
    any noise injection, so a 2-step SDE sample (step 1 is terminal) must be
    fully deterministic in the rng key."""
    tables = _tables(2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))

    def denoise(xx, sigma, cfg_b, ctrl_s):
        return xx * 0.9

    out1 = S.dpmpp2m_sample(denoise, x, jax.random.PRNGKey(1), tables, eta=1.0)
    out2 = S.dpmpp2m_sample(denoise, x, jax.random.PRNGKey(2), tables, eta=1.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-7)


def test_restore_dpmpp2m_mid_steps_do_inject_noise():
    tables = _tables(4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))

    def denoise(xx, sigma, cfg_b, ctrl_s):
        return xx * 0.9

    out1 = S.dpmpp2m_sample(denoise, x, jax.random.PRNGKey(1), tables, eta=1.0)
    out2 = S.dpmpp2m_sample(denoise, x, jax.random.PRNGKey(2), tables, eta=1.0)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-6


# ------------------------------------------- middle block trainability

@pytest.mark.slow
def test_middle_block_trains_input_blocks_frozen():
    from supir_tpu.engine.factory import create_engine, tiny_test_config

    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    b, lat = 1, 8
    x = jnp.ones((b, lat, lat, 4)) * 0.1
    t = jnp.full((b,), 500.0)
    ca = jnp.ones((b, 77, cfg.unet.context_dim)) * 0.01
    vec = jnp.ones((b, cfg.unet.adm_in_channels)) * 0.01

    # the OutputHead conv is zero-init; randomize it so the loss is not
    # identically zero (otherwise every grad is trivially 0)
    params0 = dict(engine.params["unet"])
    params0["out"] = jax.tree_util.tree_map(
        lambda v: jax.random.normal(jax.random.PRNGKey(9), v.shape, v.dtype) * 0.02,
        params0["out"],
    )

    def loss(unet_params):
        ctl = engine.control_net.apply(
            {"params": engine.params["control"]}, x, t, x, ca, vec
        )
        out = engine.unet.apply({"params": unet_params}, x, t, ca, vec, ctl, 1.0)
        return jnp.sum(out**2)

    g = jax.grad(loss)(params0)
    mid_norm = sum(
        float(jnp.abs(v).sum())
        for v in jax.tree_util.tree_leaves(g["enc"]["mid_res1"])
    )
    in_norm = sum(
        float(jnp.abs(v).sum())
        for k, sub in g["enc"].items()
        if k.startswith("in_") or k == "conv_in"
        for v in jax.tree_util.tree_leaves(sub)
    )
    time_norm = sum(
        float(jnp.abs(v).sum()) for v in jax.tree_util.tree_leaves(g["time"])
    )
    assert mid_norm > 0.0, "middle block must receive gradients (SUPIR_v0.py:631-633)"
    assert in_norm == 0.0, "input blocks are frozen (no_grad region)"
    assert time_norm == 0.0, "time embedding is frozen (no_grad region)"


# ------------------------------------------------- progressive masks

def test_progressive_mask_schedule():
    from supir_tpu.models.control import progressive_adapter_masks
    from supir_tpu.engine.factory import tiny_test_config

    cfg, _ = tiny_test_config()
    n_adapters = len(cfg.control.cond_output_channels) + len(
        cfg.control.cross_attn_insert_idx
    )
    m0 = progressive_adapter_masks(cfg.control, 0)
    m_last = progressive_adapter_masks(cfg.control, 99)
    assert m0.shape == (n_adapters,)
    assert float(m0.sum()) == 11.0  # XL-base first stage masks 11
    assert float(m_last.sum()) == 0.0
    # monotone unmasking
    sums = [float(progressive_adapter_masks(cfg.control, s).sum()) for s in range(5)]
    assert sums == sorted(sums, reverse=True)


@pytest.mark.slow
def test_masked_adapters_zero_control_contribution():
    """With every adapter masked, changing the control features must not
    change the output (the GN + blend still run, but control adds nothing)."""
    from supir_tpu.engine.factory import create_engine, tiny_test_config

    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    # randomize the zero-init adapter convs so the mask actually matters
    def randomize(p, key=jax.random.PRNGKey(5)):
        leaves, treedef = jax.tree_util.tree_flatten(p)
        keys = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef, [jax.random.normal(k, l.shape, l.dtype) * 0.02 for k, l in zip(keys, leaves)]
        )

    unet_params = dict(engine.params["unet"])
    for name in list(unet_params):
        if name.startswith("proj_") or name == "out":
            unet_params[name] = randomize(unet_params[name])

    b, lat = 1, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (b, lat, lat, 4))
    t = jnp.full((b,), 500.0)
    ca = jax.random.normal(jax.random.PRNGKey(2), (b, 77, cfg.unet.context_dim)) * 0.1
    vec = jnp.zeros((b, cfg.unet.adm_in_channels))
    ctl1 = engine.control_net.apply(
        {"params": engine.params["control"]}, x, t, x, ca, vec
    )
    ctl2 = [c + 1.0 for c in ctl1]

    n_adapters = len(cfg.control.cond_output_channels) + len(
        cfg.control.cross_attn_insert_idx
    )
    masks = jnp.ones((n_adapters,))
    out1 = engine.unet.apply({"params": unet_params}, x, t, ca, vec, ctl1, 1.0,
                             adapter_masks=masks)
    out2 = engine.unet.apply({"params": unet_params}, x, t, ca, vec, ctl2, 1.0,
                             adapter_masks=masks)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    # unmasked: control features DO change the output
    out3 = engine.unet.apply({"params": unet_params}, x, t, ca, vec, ctl1, 1.0)
    out4 = engine.unet.apply({"params": unet_params}, x, t, ca, vec, ctl2, 1.0)
    assert np.abs(np.asarray(out3) - np.asarray(out4)).max() > 1e-4
