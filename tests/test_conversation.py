"""Conversation template registry: golden parity against the reference's
own template engine (/root/reference/llava/conversation.py, loaded directly
as the oracle — it is stdlib-only)."""

import importlib.util
import os

import pytest

from supir_tpu.captioner import conversation as ours

REF = "/root/reference/llava/conversation.py"


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF):
        pytest.skip("reference not available")
    spec = importlib.util.spec_from_file_location("ref_conversation", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


TEMPLATES = ["v0", "v1", "vicuna_v1", "llama_2", "plain", "llava_v1",
             "llava_llama_2", "mpt"]


@pytest.mark.parametrize("name", TEMPLATES)
def test_prompt_parity_single_turn(ref, name):
    q = "<image>\nDescribe this image and its style in a very detailed manner."
    r = ref.conv_templates[name].copy()
    r.append_message(r.roles[0], q)
    r.append_message(r.roles[1], None)
    o = ours.conv_templates[name].copy()
    o.append_message(o.roles[0], q)
    o.append_message(o.roles[1], None)
    assert o.get_prompt() == r.get_prompt(), name


# "plain" excluded: the reference's PLAIN style has sep2=None and raises
# TypeError on answered multi-turn exchanges (it is a single-turn
# pretraining format)
@pytest.mark.parametrize("name", [t for t in TEMPLATES if t != "plain"])
def test_prompt_parity_multi_turn(ref, name):
    turns = [("What is this?", "A cat."), ("What color?", None)]
    r = ref.conv_templates[name].copy()
    o = ours.conv_templates[name].copy()
    for i, (u, a) in enumerate(turns):
        utxt = ("<image>\n" + u) if i == 0 else u
        r.append_message(r.roles[0], utxt)
        o.append_message(o.roles[0], utxt)
        r.append_message(r.roles[1], a)
        o.append_message(o.roles[1], a)
    assert o.get_prompt() == r.get_prompt(), name


def test_stop_str_matches_reference_semantics(ref):
    for name in TEMPLATES:
        r = ref.conv_templates[name]
        expected = r.sep if r.sep_style == ref.SeparatorStyle.SINGLE else r.sep2
        assert ours.conv_templates[name].stop_str == expected, name


def test_build_prompt_matches_agent_legacy():
    from supir_tpu.captioner.agent import DEFAULT_QUESTION, vicuna_v1_prompt

    assert vicuna_v1_prompt(DEFAULT_QUESTION) == ours.build_prompt(
        "vicuna_v1", DEFAULT_QUESTION
    )
    assert "<image>" in ours.build_prompt("mpt", "hi")
    assert ours.build_prompt("plain", "hi", with_image=True).startswith("<image>")


def test_copy_is_independent():
    c = ours.conv_templates["vicuna_v1"].copy()
    c.append_message(c.roles[0], "x")
    assert not ours.conv_templates["vicuna_v1"].messages
