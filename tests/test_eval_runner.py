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


def test_flops_estimator_scales():
    cfg = SUPIRConfig()
    f64 = unet_eval_flops(cfg.unet, 64)
    f128 = unet_eval_flops(cfg.unet, 128)
    assert f128 > 2.5 * f64  # superlinear in resolution (attention)
    total = pipeline_flops(cfg, 128, 50)
    # SDXL-class model at 1024^2, 50 steps, CFG x2: O(100) TFLOPs
    assert 50e12 < total < 2e15, total
