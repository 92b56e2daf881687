"""Web demo handlers end to end (tiny engine, direct method calls +
history/feedback logging)."""

import base64
import io
import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from supir_tpu.apps.web_demo import PRESETS, DemoServer
from supir_tpu.engine.factory import create_engine, tiny_test_config


@pytest.fixture(scope="module")
def demo(tmp_path_factory):
    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    hist = str(tmp_path_factory.mktemp("history"))
    return DemoServer(engine, cfg, history_dir=hist)


def _img_b64(size=80):
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_presets():
    assert PRESETS["Quality"]["s_cfg"] == 7.5
    assert PRESETS["Fidelity"]["s_cfg"] == 4.0


def test_stage1_and_history(demo):
    out = demo.stage1({"image": _img_b64()})
    assert "image" in out and out["event_id"]
    d = os.path.join(demo.history_dir, out["event_id"])
    assert os.path.exists(os.path.join(d, "params.json"))
    assert os.path.exists(os.path.join(d, "out.png"))
    # feedback logging
    assert demo.feedback(out["event_id"], 1)
    with open(os.path.join(d, "feedback.json")) as f:
        assert json.load(f)["score"] == 1
    assert not demo.feedback("nonexistent", 1)


@pytest.mark.heavy
def test_stage2_runs(demo):
    out = demo.stage2(
        {"image": _img_b64(), "edm_steps": 2, "upscale": 1, "preset": "Fidelity",
         "color_fix_type": "AdaIn", "min_size": 64}
    )
    assert "image" in out and out["event_id"]
    img = Image.open(io.BytesIO(base64.b64decode(out["image"])))
    assert img.size[0] >= 64


@pytest.mark.slow
def test_model_hot_swap():
    cfg, cond_cfg = tiny_test_config()
    engine = create_engine(cfg, cond_cfg, rng=jax.random.PRNGKey(0), image_size=64)
    params_q = engine.params
    calls = []

    def load_f():
        calls.append(1)
        import jax.numpy as jnp
        return jax.tree_util.tree_map(lambda v: v * 1.0, params_q)

    demo = DemoServer(engine, cfg, history_dir="/tmp/hist_swap",
                      param_sets={"Q": params_q, "F": load_f}, active_sign="Q")
    assert demo.select_model("Q") == "Q" and not calls  # no-op, no load
    assert demo.select_model("F") == "F"
    assert calls == [1]  # lazy loader materialized once
    assert engine.params is not params_q
    demo.select_model("Q")
    assert engine.params is params_q  # instant swap back from RAM
    demo.select_model("F")
    assert calls == [1]  # cached, not re-loaded
    with pytest.raises(ValueError, match="unknown checkpoint"):
        demo.select_model("X")
