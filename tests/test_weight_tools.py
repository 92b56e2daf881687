"""LLaVA weight tools: apply/make delta round trip + consolidate, at the
state-dict level and through the CLI."""

import os

import numpy as np
import pytest

from supir_tpu.captioner import weight_tools as W


def _base_sd(rng):
    return {
        "model.embed_tokens.weight": rng.normal(size=(10, 4)).astype(np.float32),
        "lm_head.weight": rng.normal(size=(10, 4)).astype(np.float32),
        "model.layers.0.mlp.up_proj.weight": rng.normal(size=(8, 4)).astype(np.float32),
    }


def _target_sd(rng, base):
    # target has an extended vocab (12 > 10) + multimodal additions
    t = {
        "model.embed_tokens.weight": rng.normal(size=(12, 4)).astype(np.float32),
        "lm_head.weight": rng.normal(size=(12, 4)).astype(np.float32),
        "model.layers.0.mlp.up_proj.weight": rng.normal(size=(8, 4)).astype(np.float32),
        "model.mm_projector.0.weight": rng.normal(size=(4, 4)).astype(np.float32),
    }
    return t


def test_delta_round_trip(rng):
    base = _base_sd(rng)
    target = _target_sd(rng, base)
    delta = W.make_delta_sd(base, target)
    recovered = W.apply_delta_sd(base, delta)
    assert set(recovered) == set(target)
    for k in target:
        np.testing.assert_allclose(recovered[k], target[k], atol=1e-6, err_msg=k)


def test_apply_delta_rejects_unknown_extra_key(rng):
    base = _base_sd(rng)
    delta = {"model.layers.99.bogus.weight": np.zeros((2, 2), np.float32)}
    with pytest.raises(AssertionError, match="not in base model"):
        W.apply_delta_sd(base, delta)


def test_cli_round_trip(tmp_path, rng):
    from safetensors.numpy import save_file

    base = _base_sd(rng)
    target = _target_sd(rng, base)
    bdir, tdir, ddir, odir = (tmp_path / n for n in ("b", "t", "d", "o"))
    for d in (bdir, tdir):
        d.mkdir()
    save_file(base, str(bdir / "model.safetensors"))
    save_file(target, str(tdir / "model.safetensors"))
    (tdir / "config.json").write_text("{}")

    W.main(["make-delta", "--base", str(bdir), "--target", str(tdir),
            "--delta", str(ddir)])
    assert (ddir / "config.json").exists()  # sidecar copied
    W.main(["apply-delta", "--base", str(bdir), "--delta", str(ddir),
            "--target", str(odir)])
    out = W.load_state_dir(str(odir))
    for k in target:
        np.testing.assert_allclose(out[k], target[k], atol=1e-6, err_msg=k)


def test_consolidate_merges_shards(tmp_path, rng):
    from safetensors.numpy import save_file

    s = tmp_path / "src"
    s.mkdir()
    save_file({"a": np.ones((2, 2), np.float32)}, str(s / "model-00001.safetensors"))
    save_file({"b": np.zeros((3,), np.float32)}, str(s / "model-00002.safetensors"))
    d = tmp_path / "dst"
    W.main(["consolidate", "--src", str(s), "--dst", str(d)])
    out = W.load_state_dir(str(d))
    assert set(out) == {"a", "b"}
