"""Conversation-training preprocessing: golden parity against the
reference's own `llava/train/train.py` preprocess functions (loaded with the
model/trainer imports stubbed — they are unused by preprocessing), plus
dataset/collator/train-step coverage."""

import importlib.util
import re
import sys
import types

import numpy as np
import pytest

from supir_tpu.captioner import preprocess as ours

REF_ROOT = "/root/reference/llava"
IGNORE = ours.IGNORE_INDEX


class WordTokenizer:
    """Deterministic toy tokenizer with llama-like behavior: optional bos,
    separator strings ("</s>", "<|im_end|>") are single tokens. Implements
    both the HF `tokenizer(text).input_ids` protocol (used by the reference)
    and `.encode` (used by ours)."""

    _SEP_RE = re.compile(r"(</s>|<\|im_end\|>)")

    def __init__(self, add_bos=True):
        self.add_bos = add_bos
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.pad_token_id = 0
        self.model_max_length = 2048
        self.vocab = {}

    def _id(self, w):
        return self.vocab.setdefault(w, len(self.vocab) + 4)

    def _words(self, text):
        toks = []
        for part in self._SEP_RE.split(text):
            if part in ("</s>", "<|im_end|>"):
                toks.append(part)
            else:
                toks.extend(part.split())
        return toks

    def encode(self, text):
        ids = [self.bos_token_id] if self.add_bos else []
        return ids + [self._id(w) for w in self._words(text)]

    def __call__(self, text, **kw):
        out = types.SimpleNamespace()
        out.input_ids = self.encode(text)
        return out


@pytest.fixture(scope="module")
def oracle():
    """The reference's train.py preprocess functions, with llava.model and
    the HF-Trainer subclass stubbed out (neither is touched by
    preprocessing)."""
    import os

    if not os.path.exists(REF_ROOT + "/train/train.py"):
        pytest.skip("reference not available")
    saved = {k: sys.modules.get(k) for k in
             ("llava", "llava.model", "llava.train", "llava.train.llava_trainer")}
    pkg = types.ModuleType("llava")
    pkg.__path__ = [REF_ROOT]
    sys.modules["llava"] = pkg
    fm = types.ModuleType("llava.model")
    fm.__all__ = []
    sys.modules["llava.model"] = fm
    tp = types.ModuleType("llava.train")
    tp.__path__ = [REF_ROOT + "/train"]
    sys.modules["llava.train"] = tp
    ft = types.ModuleType("llava.train.llava_trainer")
    ft.LLaVATrainer = object
    sys.modules["llava.train.llava_trainer"] = ft
    try:
        spec = importlib.util.spec_from_file_location(
            "llava.train.train", REF_ROOT + "/train/train.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


CONV = [
    {"from": "human", "value": "<image>\nDescribe this image and its style."},
    {"from": "gpt", "value": "A watercolor harbor scene with tall ships."},
    {"from": "human", "value": "What colors dominate ?"},
    {"from": "gpt", "value": "Teal and amber , with muted grays ."},
]


def _oracle_out(oracle, fn, sources, tok, template, **kw):
    oracle.conversation_lib.default_conversation = \
        oracle.conversation_lib.conv_templates[template]
    out = fn([s for s in sources], tok, **kw)
    ids = [np.asarray(x) for x in out["input_ids"]]
    labs = [np.asarray(x) for x in out["labels"]]
    return ids, labs


def _assert_match(ref_ids, ref_labs, out, name):
    got_ids = [np.asarray(x) for x in out["input_ids"]]
    got_labs = [np.asarray(x) for x in out["labels"]]
    for a, b in zip(ref_ids, got_ids):
        np.testing.assert_array_equal(a, b, err_msg=f"{name}: input_ids")
    for a, b in zip(ref_labs, got_labs):
        np.testing.assert_array_equal(a, b, err_msg=f"{name}: labels")


def test_v1_parity(oracle):
    import copy

    tok = WordTokenizer()
    src = [copy.deepcopy(CONV)]
    ref_ids, ref_labs = _oracle_out(
        oracle, oracle.preprocess_v1, copy.deepcopy(src), tok, "vicuna_v1",
        has_image=True)
    out = ours.preprocess_v1(copy.deepcopy(src), tok, has_image=True)
    _assert_match(ref_ids, ref_labs, out, "v1")
    # sanity: masking is non-degenerate (answers unmasked, questions masked)
    lab = np.asarray(out["labels"][0])
    assert (lab != IGNORE).sum() > 0 and (lab == IGNORE).sum() > 2


def test_mpt_parity(oracle):
    import copy

    tok = WordTokenizer(add_bos=False)  # MPT tokenizers add no bos
    src = [copy.deepcopy(CONV)]
    ref_ids, ref_labs = _oracle_out(
        oracle, oracle.preprocess_mpt, copy.deepcopy(src), tok, "mpt")
    out = ours.preprocess_mpt(copy.deepcopy(src), tok)
    _assert_match(ref_ids, ref_labs, out, "mpt")
    lab = np.asarray(out["labels"][0])
    assert (lab != IGNORE).sum() > 0


def test_plain_parity(oracle):
    import copy

    tok = WordTokenizer()
    src = [copy.deepcopy(CONV[:2])]
    ref_ids, ref_labs = _oracle_out(
        oracle, oracle.preprocess_plain, copy.deepcopy(src), tok, "plain")
    out = ours.preprocess_plain(copy.deepcopy(src), tok)
    _assert_match(ref_ids, ref_labs, out, "plain")


def test_llama2_parity(oracle):
    import copy

    tok = WordTokenizer()
    src = [copy.deepcopy(CONV)]
    ref_ids, ref_labs = _oracle_out(
        oracle, oracle.preprocess_llama_2, copy.deepcopy(src), tok,
        "llava_llama_2", has_image=True)
    out = ours.preprocess_llama_2(
        copy.deepcopy(src), tok,
        has_image=True,
        template=ours.conv_templates["llava_llama_2"])
    _assert_match(ref_ids, ref_labs, out, "llama_2")


def test_v0_default_parity(oracle):
    import copy

    tok = WordTokenizer()
    src = [copy.deepcopy(CONV)]
    ref_ids, ref_labs = _oracle_out(
        oracle, oracle.preprocess, copy.deepcopy(src), tok, "v0",
        has_image=True)
    out = ours.preprocess(copy.deepcopy(src), tok, has_image=True,
                          template_name="v0")
    _assert_match(ref_ids, ref_labs, out, "v0")


def test_multimodal_normalization_parity(oracle):
    import copy

    raw = [[{"from": "human", "value": "Please describe <image> carefully."},
            {"from": "gpt", "value": "Sure."}]]

    class DA:
        is_multimodal = True
        mm_use_im_start_end = False

    oracle.conversation_lib.default_conversation = \
        oracle.conversation_lib.conv_templates["vicuna_v1"]
    ref = oracle.preprocess_multimodal(copy.deepcopy(raw), DA())
    got = ours.normalize_multimodal(copy.deepcopy(raw), False, "v1")
    assert ref == got


# ------------------------------------------------------------ dataset/batch

def _records():
    return [
        {"image": "a.png", "conversations": CONV},
        {"conversations": [
            {"from": "human", "value": "Summarize the plot of Hamlet."},
            {"from": "gpt", "value": "A prince avenges his father."},
        ]},
    ]


def test_lazy_dataset_and_collator():
    tok = WordTokenizer()
    loader = lambda path: np.full((24, 17, 3), 128, np.uint8)
    ds = ours.LazyCaptionDataset(
        _records(), tok, template_name="v1", image_loader=loader,
        image_size=32, blank_image_shape=(32, 32, 3))
    assert len(ds) == 2
    assert ds.lengths[0] > 128 and ds.lengths[1] < 128
    assert ds.modality_lengths[0] > 0 > ds.modality_lengths[1]
    items = [ds[0], ds[1]]
    assert items[0]["image"].shape == (32, 32, 3)
    assert (items[0]["input_ids"] == ours.IMAGE_TOKEN_INDEX).sum() == 1
    assert (items[1]["input_ids"] == ours.IMAGE_TOKEN_INDEX).sum() == 0
    batch = ours.collate(items, pad_id=tok.pad_token_id, max_len=96)
    assert batch["input_ids"].shape == (2, 96)
    assert batch["labels"].shape == (2, 96)
    assert batch["images"].shape == (2, 32, 32, 3)
    # labels padded with IGNORE, ids with pad
    row_len = len(items[1]["input_ids"])
    assert (batch["labels"][1, row_len:] == IGNORE).all()
    assert (batch["input_ids"][1, row_len:] == tok.pad_token_id).all()


def test_token_train_step_loss_decreases_and_masking():
    """End-to-end: llava-format records -> dataset -> collator -> jitted
    token-level train step; loss decreases and IGNORE positions carry no
    gradient signal (loss invariant to their label values)."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from supir_tpu.captioner.agent import CaptionerAgent
    from supir_tpu.captioner.train import CaptionerTrainer

    agent = CaptionerAgent.create_random()
    img_size = agent.cfg.vision.image_size
    tok = WordTokenizer()
    loader = lambda path: np.full((img_size, img_size, 3), 100, np.uint8)
    ds = ours.LazyCaptionDataset(
        _records()[:1] * 2, tok, template_name="v1", image_loader=loader,
        image_size=img_size)
    batch = ours.collate([ds[0], ds[1]], pad_id=tok.pad_token_id, max_len=64)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                             ("data", "model"))
    trainer = CaptionerTrainer(agent, mesh, learning_rate=5e-3, mode="full")
    state = trainer.init_state(dict(agent.params))

    losses = []
    for _ in range(4):
        state, loss = trainer.train_step_tokens(state, dict(batch))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_masked_positions_carry_no_gradient():
    """d(loss)/d(logits) is exactly zero at every position whose next-token
    label is IGNORE_INDEX — the preprocess masking contract."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from supir_tpu.captioner.train import causal_lm_loss

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 12, 17)), jnp.float32)
    labels = rng.integers(0, 17, size=(2, 12))
    labels[0, :6] = IGNORE
    labels[1, 3:5] = IGNORE
    labels = jnp.asarray(labels)
    g = np.asarray(jax.grad(lambda lg: causal_lm_loss(lg, labels))(logits))
    next_masked = np.asarray(labels)[:, 1:] == IGNORE
    assert np.abs(g[:, :-1][next_masked]).max() == 0.0
    assert np.abs(g[:, :-1][~next_masked]).max() > 0.0
