"""tools/load_real.py readiness drill, smoke-tested end-to-end: a tiny
reference SUPIRModel's state_dict saved to disk as a checkpoint file, then
the drill run twice — once producing an output image, once PSNR-checking
against it (same pipeline => near-infinite PSNR => PASS verdict).

This keeps the drill executable so the day real SDXL/SUPIR weights mount,
`python tools/load_real.py --sdxl ... --supir ...` is a known-good command
(VERDICT round-3 missing #5 / next-step 7; reference SUPIR/util.py:34-51)."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tests import ref_oracle as O

    m = O.build_tiny_supir_model(num_steps=2)
    sd = {k: v.detach().numpy().copy() for k, v in m.state_dict().items()}
    d = tmp_path_factory.mktemp("real_drill")
    path = str(d / "tiny_supir_merged.safetensors")
    from safetensors.numpy import save_file

    save_file(sd, path)
    return path, str(d)


def test_drill_pass_and_psnr_roundtrip(tiny_ckpt, capsys):
    from tools.load_real import main

    path, d = tiny_ckpt
    out_png = os.path.join(d, "out.png")
    base_args = [
        "--tiny", "--random_conditioner", "--allow_hash_tokenizer",
        "--sdxl", path, "--steps", "2", "--size", "64", "--save", out_png,
    ]
    rc = main(base_args)
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "VERDICT: PASS" in out
    assert os.path.exists(out_png)

    # second run, PSNR vs the first output: identical pipeline => PASS
    rc = main(base_args + ["--ref_out", out_png, "--psnr_min", "45"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[PASS] psnr" in out


def test_drill_fails_on_missing_keys(tiny_ckpt, tmp_path, capsys):
    """An incomplete checkpoint must produce a FAIL verdict at stage 1."""
    from safetensors.numpy import load_file, save_file

    from tools.load_real import main

    path, _ = tiny_ckpt
    sd = load_file(path)
    # drop a whole namespace
    sd = {k: v for k, v in sd.items() if not k.startswith("model.control_model.")}
    bad = str(tmp_path / "incomplete.safetensors")
    save_file(sd, bad)
    rc = main([
        "--tiny", "--random_conditioner", "--allow_hash_tokenizer",
        "--sdxl", bad, "--steps", "2", "--size", "64",
        "--save", str(tmp_path / "x.png"),
    ])
    out = capsys.readouterr().out
    assert rc == 1
    assert "[FAIL] conversion" in out
    assert "VERDICT: FAIL" in out
