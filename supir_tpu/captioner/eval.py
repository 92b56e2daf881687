"""Captioner eval runner — the `llava/eval/model_vqa.py` surface: answer a
jsonl of (image, question) pairs and write an answers jsonl for downstream
judging. GPT-review judging (eval_gpt_review*.py) needs an external LLM
endpoint and is out of scope for an offline TPU box; the answer files it
consumes are produced here in the same format.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional

import numpy as np


def run_vqa(
    agent,
    question_file: str,
    image_dir: str,
    answers_file: str,
    temperature: float = 0.2,
    top_p: float = 0.7,
    limit: Optional[int] = None,
):
    """questions jsonl rows: {"question_id", "image", "text"}; answers rows
    mirror the reference's: {"question_id", "prompt", "text", "answer_id",
    "model_id", "metadata"}."""
    from PIL import Image

    with open(question_file) as f:
        questions = [json.loads(l) for l in f if l.strip()]
    if limit:
        questions = questions[:limit]

    os.makedirs(os.path.dirname(os.path.abspath(answers_file)), exist_ok=True)
    n = 0
    with open(answers_file, "w") as out:
        for q in questions:
            img = Image.open(os.path.join(image_dir, q["image"])).convert("RGB")
            ans = agent.gen_image_caption(
                [np.asarray(img)], temperature=temperature, top_p=top_p,
                qs=q.get("text") or None,
            )[0]
            out.write(
                json.dumps(
                    {
                        "question_id": q.get("question_id", n),
                        "prompt": q.get("text", ""),
                        "text": ans,
                        "answer_id": uuid.uuid4().hex[:12],
                        "model_id": "supir-tpu-captioner",
                        "metadata": {"ts": time.time()},
                    }
                )
                + "\n"
            )
            n += 1
    return n


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--question-file", required=True)
    ap.add_argument("--image-folder", required=True)
    ap.add_argument("--answers-file", required=True)
    ap.add_argument("--temperature", type=float, default=0.2)
    ap.add_argument("--top_p", type=float, default=0.7)
    ap.add_argument("--tiny-random", action="store_true")
    args = ap.parse_args(argv)

    from supir_tpu.captioner.agent import CaptionerAgent

    if args.tiny_random:
        agent = CaptionerAgent.create_random()
    else:
        agent = CaptionerAgent.create_default()
    n = run_vqa(
        agent, args.question_file, args.image_folder, args.answers_file,
        args.temperature, args.top_p,
    )
    print(f"answered {n} questions -> {args.answers_file}")


if __name__ == "__main__":
    main()
