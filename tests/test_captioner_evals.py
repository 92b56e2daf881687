"""Eval-metric parity tests.

Where possible, results are checked against the REFERENCE implementation
imported as an oracle (m4c_evaluator has no torch deps beyond tqdm), so
normalization and scoring match the upstream metric bit-for-bit.
"""

import json
import sys

import numpy as np
import pytest

from supir_tpu.captioner import evals


def _reference_m4c():
    # load the module file directly: importing the llava package pulls the
    # full torch/transformers model stack
    import importlib.util

    path = "/root/reference/llava/eval/m4c_evaluator.py"
    try:
        spec = importlib.util.spec_from_file_location("ref_m4c", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


REF = _reference_m4c()


@pytest.mark.skipif(REF is None, reason="reference oracle unavailable")
@pytest.mark.parametrize(
    "text",
    [
        "A dog, and the CAT!",
        "it's 1,234 dollars.",
        "dont know... maybe seven?",
        "y'alld've seen one-two punch (really)",
        "He's   got\tnine\nlives",
    ],
)
def test_normalize_answer_matches_reference(text):
    ref = REF.EvalAIAnswerProcessor()
    assert evals.normalize_answer(text) == ref(text)


@pytest.mark.skipif(REF is None, reason="reference oracle unavailable")
def test_textvqa_accuracy_matches_reference():
    rng = np.random.RandomState(0)
    vocab = ["cat", "dog", "a dog", "two", "2", "blue", "none"]
    preds = []
    for _ in range(25):
        preds.append({
            "pred_answer": vocab[rng.randint(len(vocab))],
            "gt_answers": [vocab[rng.randint(len(vocab))] for _ in range(10)],
        })
    ours = evals.textvqa_accuracy(preds)
    theirs = REF.TextVQAAccuracyEvaluator().eval_pred_list(preds)
    assert abs(ours - theirs) < 1e-9


@pytest.mark.skipif(REF is None, reason="reference oracle unavailable")
def test_stvqa_accuracy_matches_reference():
    preds = [
        {"pred_answer": "The Cat!", "gt_answers": ["cat", "a cat"]},
        {"pred_answer": "dog", "gt_answers": ["cat"]},
        {"pred_answer": "seven", "gt_answers": ["7"]},
    ]
    ours = evals.stvqa_accuracy(preds)
    theirs = REF.STVQAAccuracyEvaluator().eval_pred_list(preds)
    assert abs(ours - theirs) < 1e-9


def test_anls():
    preds = [
        {"pred_answer": "hello", "gt_answers": ["hello"]},      # 1.0
        {"pred_answer": "helo", "gt_answers": ["hello"]},       # 0.8
        {"pred_answer": "xyz", "gt_answers": ["hello"]},        # < .5 -> 0
    ]
    got = evals.anls_score(preds)
    assert abs(got - (1.0 + 0.8 + 0.0) / 3) < 1e-9


def test_levenshtein():
    assert evals._levenshtein("kitten", "sitting") == 3
    assert evals._levenshtein("", "abc") == 3
    assert evals._levenshtein("abc", "abc") == 0


def test_pope_binarize_and_metrics():
    # reference semantics: first sentence only; no/not/No => no
    assert evals.pope_binarize("No, there is not.") == "no"
    assert evals.pope_binarize("Yes. No wait.") == "yes"
    assert evals.pope_binarize("It is not there") == "no"
    answers = [{"text": "Yes"}, {"text": "No"}, {"text": "yes it is"},
               {"text": "there is no dog"}]
    labels = ["yes", "no", "no", "no"]
    m = evals.eval_pope(answers, labels)
    assert m["TP"] == 1 and m["TN"] == 2 and m["FP"] == 1 and m["FN"] == 0
    assert abs(m["f1"] - 2 * 0.5 * 1.0 / 1.5) < 1e-9
    assert m["yes_ratio"] == 0.5


def test_textvqa_prompt_processor():
    p1 = "OCR tokens: foo bar Question: what is shown? Short answer:"
    assert evals.textvqa_question_from_prompt(p1) == "what is shown?"
    p2 = "what color?\nAnswer the question using a single word or phrase."
    assert evals.textvqa_question_from_prompt(p2) == "what color?"
    p3 = "Reference OCR token: STOP\nwhat does the sign say?\nShort answer:"
    assert evals.textvqa_question_from_prompt(p3) == "what does the sign say?"


def test_science_qa_eval():
    problems = {
        "1": {"choices": ["x", "y"], "answer": 1, "image": "im.png"},
        "2": {"choices": ["x", "y", "z"], "answer": 0, "image": None},
        "3": {"choices": ["x", "y"], "answer": 0, "image": None},
    }
    predictions = {
        "1": {"text": "The answer is B."},
        "2": {"text": "The answer is C."},
        # "3" missing -> FAILED
    }
    m = evals.eval_science_qa(problems, predictions, ["1", "2", "3"])
    assert m["total"] == 3
    assert abs(m["accuracy"] - 1 / 3) < 1e-9
    assert m["image_accuracy"] == 1.0 and m["image_total"] == 1


def test_pairwise_review_and_summary():
    rules = {"default": {"role": "Assistant", "prompt": "Rate both 1-10."}}
    questions = [{"text": "Q1", "question_id": 7, "category": "default"}]
    a1 = [{"text": "short", "answer_id": "a"}]
    a2 = [{"text": "detailed", "answer_id": "b"}]

    def judge(content):
        assert "[Question]" in content and "[Assistant 1]" in content
        return "6 8\nAssistant 2 was more detailed."

    rows = evals.pairwise_review(questions, a1, a2, rules, judge)
    assert rows[0]["tuple"] == [6.0, 8.0]
    summary = evals.summarize_reviews(rows)
    assert summary["all"]["relative_pct"] == round(8 / 6 * 100, 1)
    assert summary["default"]["n"] == 1
    # malformed review parses to [-1, -1]
    assert evals.parse_review_scores("great answer!") == [-1.0, -1.0]


def test_eval_cli_score_subcommands(tmp_path):
    """The metric subcommands read the reference's file formats."""
    from supir_tpu.captioner.eval import score_main

    # --- POPE
    ann_dir = tmp_path / "pope"
    ann_dir.mkdir()
    with open(ann_dir / "coco_pope_popular.json", "w") as f:
        for lbl in ("yes", "no"):
            f.write(json.dumps({"label": lbl}) + "\n")
    qf = tmp_path / "q.jsonl"
    with open(qf, "w") as f:
        f.write(json.dumps({"question_id": 1, "category": "popular"}) + "\n")
        f.write(json.dumps({"question_id": 2, "category": "popular"}) + "\n")
    rf = tmp_path / "r.jsonl"
    with open(rf, "w") as f:
        f.write(json.dumps({"question_id": 1, "text": "Yes, it is."}) + "\n")
        f.write(json.dumps({"question_id": 2, "text": "No."}) + "\n")
    score_main("score-pope", [
        "--annotation-dir", str(ann_dir),
        "--question-file", str(qf), "--result-file", str(rf)])

    # --- ScienceQA
    base = tmp_path / "sqa"
    base.mkdir()
    with open(base / "pid_splits.json", "w") as f:
        json.dump({"test": ["1"]}, f)
    with open(base / "problems.json", "w") as f:
        json.dump({"1": {"choices": ["x", "y"], "answer": 0, "image": None}}, f)
    sr = tmp_path / "sqa.jsonl"
    with open(sr, "w") as f:
        f.write(json.dumps({"question_id": "1", "text": "The answer is A."}) + "\n")
    score_main("score-sqa", ["--base-dir", str(base), "--result-file", str(sr)])


def test_report_subcommand(tmp_path, capsys):
    """`eval report` renders metric JSONs + review JSONLs into one static
    HTML page (llava/eval tables+webpage analogue)."""
    import json

    from supir_tpu.captioner.eval import score_main

    (tmp_path / "textvqa.json").write_text(json.dumps({"accuracy": 0.51, "n": 20}))
    rows = [
        {"category": "detail", "tuple": [6.0, 8.0]},
        {"category": "conv", "tuple": [7.0, 7.0]},
    ]
    (tmp_path / "review_pairwise.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )
    out = tmp_path / "report.html"
    score_main("report", ["--dir", str(tmp_path), "--output", str(out)])
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["sections"] == ["review_pairwise.jsonl", "textvqa.json"]
    html = out.read_text()
    assert "accuracy" in html and "relative_pct" in html and "detail" in html
