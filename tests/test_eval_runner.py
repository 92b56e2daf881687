"""Captioner VQA eval runner + FLOP estimator sanity."""

import json
import os

import numpy as np
from PIL import Image

from supir_tpu.captioner.agent import CaptionerAgent
from supir_tpu.captioner.eval import run_vqa
from supir_tpu.config import SUPIRConfig
from supir_tpu.utils.flops import pipeline_flops, unet_eval_flops


def test_run_vqa(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(img_dir / f"im{i}.png")
    qfile = tmp_path / "q.jsonl"
    with open(qfile, "w") as f:
        for i in range(2):
            f.write(json.dumps({"question_id": i, "image": f"im{i}.png",
                                "text": "What is shown?"}) + "\n")
    afile = tmp_path / "answers.jsonl"
    agent = CaptionerAgent.create_random()
    n = run_vqa(agent, str(qfile), str(img_dir), str(afile), temperature=0.0)
    assert n == 2
    rows = [json.loads(l) for l in open(afile)]
    assert len(rows) == 2
    assert all("text" in r and r["model_id"] == "supir-tpu-captioner" for r in rows)


def test_run_mmbench_circular(tmp_path):
    """MMBench TSV runner: base64 inline image, hint prepend, option list
    truncation at the first empty cell, and --all-rounds circular rotation
    (one answer row per rotation, letters fixed while values rotate) —
    reference semantics model_vqa_mmbench.py:71-149."""
    import base64
    import io

    from supir_tpu.captioner.eval import run_mmbench

    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (32, 32, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    qfile = tmp_path / "mmbench.tsv"
    with open(qfile, "w") as f:
        f.write("index\tquestion\thint\tA\tB\tC\tD\timage\n")
        f.write(f"7\tWhich color?\tLook closely.\tred\tblue\tnan\tnan\t{b64}\n")
        f.write(f"9\tHow many?\tnan\tone\ttwo\tthree\tnan\t{b64}\n")
    afile = tmp_path / "mmbench_answers.jsonl"
    agent = CaptionerAgent.create_random()
    n = run_mmbench(agent, str(qfile), str(afile), all_rounds=True,
                    single_pred_prompt=True, temperature=0.0)
    # row 7 has 2 options -> 2 rounds; row 9 has 3 -> 3 rounds
    assert n == 5
    rows = [json.loads(l) for l in open(afile)]
    r7 = [r for r in rows if r["question_id"] == "7"]
    assert [r["round_id"] for r in r7] == [0, 1]
    assert r7[0]["options"] == ["red", "blue"]
    assert r7[1]["options"] == ["blue", "red"]  # rotated values
    assert r7[0]["option_char"] == ["A", "B"]
    assert "Look closely.\nWhich color?" in r7[0]["prompt"]
    assert "A. red\nB. blue" in r7[0]["prompt"]
    assert "A. blue\nB. red" in r7[1]["prompt"]
    assert r7[0]["prompt"].endswith("letter from the given choices directly.")
    r9 = [r for r in rows if r["question_id"] == "9"]
    assert len(r9) == 3 and r9[0]["options"] == ["one", "two", "three"]
    assert not r9[0]["prompt"].startswith("nan")  # hint 'nan' dropped


def test_run_qa_text_only(tmp_path):
    """model_qa.py parity: text-only questions answered via the chat path."""
    from supir_tpu.captioner.eval import run_qa

    qfile = tmp_path / "q.jsonl"
    with open(qfile, "w") as f:
        f.write(json.dumps({"question_id": 3, "text": "Why?"}) + "\n")
    afile = tmp_path / "a.jsonl"
    agent = CaptionerAgent.create_random()
    n = run_qa(agent, str(qfile), str(afile), temperature=0.0)
    assert n == 1
    row = json.loads(open(afile).readline())
    assert row["question_id"] == 3 and isinstance(row["text"], str)


def test_flops_estimator_scales():
    cfg = SUPIRConfig()
    f64 = unet_eval_flops(cfg.unet, 64)
    f128 = unet_eval_flops(cfg.unet, 128)
    assert f128 > 2.5 * f64  # superlinear in resolution (attention)
    total = pipeline_flops(cfg, 128, 50)
    # SDXL-class model at 1024^2, 50 steps, CFG x2: O(100) TFLOPs
    assert 50e12 < total < 2e15, total
