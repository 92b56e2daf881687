"""Captioner TP/FSDP sharding still produces identical captions."""

import jax
import numpy as np

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
