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
    # the reference's decode-stop keyword formula at its usage sites
    # (llava_agent.py:78, run_llava.py:63): sep unless style is TWO
    for name in TEMPLATES:
        r = ref.conv_templates[name]
        expected = r.sep if r.sep_style != ref.SeparatorStyle.TWO else r.sep2
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


def test_get_images_modes():
    """Pad/Resize/downscale behavior of Conversation.get_images
    (reference conversation.py:109-157)."""
    from PIL import Image

    from supir_tpu.captioner.conversation import conv_templates

    conv = conv_templates["vicuna_v1"].copy()
    img = Image.new("RGB", (1000, 500), (10, 20, 30))
    conv.append_message(conv.roles[0], ("what is this? <image>", img, "Pad"))
    conv.append_message(conv.roles[1], None)
    (out,) = conv.get_images(return_pil=True)
    # Pad squares to 1000x1000 then downscale: aspect 1, cap 400
    assert out.size == (400, 400)
    assert out.getpixel((0, 0)) == (122, 116, 104)  # CLIP mean background

    conv = conv_templates["vicuna_v1"].copy()
    conv.append_message(conv.roles[0], ("x", Image.new("RGB", (64, 64)), "Resize"))
    conv.append_message(conv.roles[1], None)
    (out,) = conv.get_images(return_pil=True)
    assert out.size == (336, 336)

    conv = conv_templates["vicuna_v1"].copy()
    conv.append_message(conv.roles[0], ("x", Image.new("RGB", (1600, 400)), "Default"))
    conv.append_message(conv.roles[1], None)
    (out,) = conv.get_images(return_pil=True)
    # aspect 4: shortest = min(800/4, 400, 400) = 200 -> (800, 200)
    assert out.size == (800, 200)
    # base64 round-trip
    b64 = conv.get_images()[0]
    import base64, io
    assert Image.open(io.BytesIO(base64.b64decode(b64))).size == (800, 200)
