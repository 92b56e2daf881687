"""Captioner TP/FSDP sharding still produces identical captions."""

import jax
import numpy as np
import pytest

from supir_tpu.captioner.agent import CaptionerAgent, CaptionerConfig
from supir_tpu.parallel.mesh import make_mesh


def test_sharded_captioner_matches_unsharded():
    agent = CaptionerAgent.create_random(CaptionerConfig.tiny())
    img = (np.random.default_rng(0).random((30, 40, 3)) * 255).astype(np.uint8)
    want = agent.gen_image_caption([img], temperature=0.0)

    mesh = make_mesh((2, 4), ("data", "model"))
    agent.shard(mesh)
    got = agent.gen_image_caption([img], temperature=0.0)
    assert got == want


@pytest.mark.heavy
def test_dual_model_placement_disjoint_devices():
    """The reference pins SUPIR to cuda:0 and LLaVA to cuda:1
    (test.py:10-17). TPU re-expression: the engine and the captioner get
    DISJOINT sub-meshes of one slice; each model's params live only on its
    own devices and both still run."""
    import jax.numpy as jnp

    from supir_tpu.engine.factory import create_engine, tiny_test_config

    devs = jax.devices()
    assert len(devs) == 8
    mesh_engine = make_mesh((1, 4), ("data", "model"), devices=devs[:4])
    mesh_cap = make_mesh((1, 4), ("data", "model"), devices=devs[4:])

    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    engine.shard_for_inference(mesh_engine)
    agent = CaptionerAgent.create_random(CaptionerConfig.tiny())
    agent.shard(mesh_cap)

    def devices_of(tree):
        out = set()
        for leaf in jax.tree_util.tree_leaves(tree):
            out |= set(getattr(leaf.sharding, "device_set", {leaf.device}))
        return out

    eng_devs = devices_of(engine.params)
    cap_devs = devices_of(agent.params)
    assert eng_devs <= set(devs[:4])
    assert cap_devs <= set(devs[4:])
    assert not (eng_devs & cap_devs)

    # both models still work after placement
    x = jnp.zeros((1, 64, 64, 3))
    z = engine.encode_first_stage_with_denoise(x)
    assert z.shape[-1] == cfg.vae.embed_dim
    img = (np.random.default_rng(0).random((30, 40, 3)) * 255).astype(np.uint8)
    caps = agent.gen_image_caption([img], temperature=0.0)
    assert isinstance(caps[0], str)
