"""Serving control plane: registry policies, heartbeat expiry, and a live
controller+worker roundtrip over HTTP (the reference's test_message.py
smoke, automated)."""

import json
import threading
import time
import urllib.request

import pytest

from supir_tpu.serve.controller import (
    CONTROLLER_HEART_BEAT_EXPIRATION,
    Registry,
    serve_controller,
)
from supir_tpu.serve.worker import ModelWorker, serve_worker


def test_registry_register_heartbeat_expire():
    reg = Registry()
    assert reg.register("http://w1", ["supir"])
    assert reg.heartbeat("http://w1", 3)
    assert not reg.heartbeat("http://nope", 0)  # unknown -> must re-register
    assert reg.list_models() == ["supir"]
    # simulate expiry
    reg.workers["http://w1"].last_heart_beat = (
        time.time() - CONTROLLER_HEART_BEAT_EXPIRATION - 1
    )
    dead = reg.remove_expired()
    assert dead == ["http://w1"]
    assert reg.list_models() == []


def test_shortest_queue_dispatch():
    reg = Registry("shortest_queue")
    reg.register("http://a", ["supir"], speed=1.0, queue_length=5)
    reg.register("http://b", ["supir"], speed=1.0, queue_length=1)
    assert reg.get_worker_address("supir") == "http://b"
    # dispatch bumps the chosen queue
    assert reg.workers["http://b"].queue_length == 2
    assert reg.get_worker_address("missing-model") == ""


def test_lottery_dispatch_respects_speed():
    reg = Registry("lottery")
    reg.register("http://fast", ["supir"], speed=100.0)
    reg.register("http://slow", ["supir"], speed=0.001)
    picks = [reg.get_worker_address("supir") for _ in range(50)]
    assert picks.count("http://fast") >= 48


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def _post_stream(url, payload, on_frame=None):
    """POST to a streaming endpoint; collect the b'\\0'-framed payloads."""
    from supir_tpu.serve.worker import iter_stream_frames

    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    frames = []
    with urllib.request.urlopen(req, timeout=30) as r:
        for f in iter_stream_frames(r):
            frames.append(f)
            if on_frame:
                on_frame(f)
    return frames


@pytest.fixture
def live_cluster():
    chttpd, registry = serve_controller("127.0.0.1", 0)
    cport = chttpd.server_address[1]
    caddr = f"http://127.0.0.1:{cport}"
    t1 = threading.Thread(target=chttpd.serve_forever, daemon=True)
    t1.start()

    def work(params):
        return {"text": f"echo:{params.get('prompt','')}", "error_code": 0}

    worker = ModelWorker(caddr, "placeholder", work, register=False)
    whttpd = serve_worker(worker, "127.0.0.1", 0)
    wport = whttpd.server_address[1]
    worker.worker_addr = f"http://127.0.0.1:{wport}"
    worker.register_to_controller()
    t2 = threading.Thread(target=whttpd.serve_forever, daemon=True)
    t2.start()
    yield caddr, worker
    chttpd.shutdown()
    whttpd.shutdown()
    worker.stop()


def test_live_roundtrip(live_cluster):
    caddr, worker = live_cluster
    models = _post(caddr + "/list_models", {})
    assert models["models"] == ["supir"]
    frames = _post_stream(
        caddr + "/worker_generate_stream", {"model": "supir", "prompt": "hello"}
    )
    out = frames[-1]
    assert out["error_code"] == 0
    assert out["text"] == "echo:hello"


def test_worker_error_isolation(live_cluster):
    caddr, worker = live_cluster

    def bad(params):
        raise ValueError("boom")

    worker.work_fn = bad
    out = _post_stream(caddr + "/worker_generate_stream", {"model": "supir"})[-1]
    assert out["error_code"] == 2
    assert "boom" in out.get("error", "")


def test_streaming_partial_chunks_through_controller(live_cluster):
    """Token streaming (reference model_worker.py:123-193 + controller
    proxy controller.py:193-219): partial payloads must arrive on the wire
    WHILE generation is still running — at least 2 partial frames before
    the work function finishes."""
    caddr, worker = live_cluster
    finished = threading.Event()

    def slow_stream(params):
        text = ""
        for word in ["a", "b", "c", "d"]:
            text += word
            yield {"text": text, "error_code": 0}
            time.sleep(0.2)
        finished.set()

    worker.work_fn = slow_stream
    seen_before_finish = []

    def on_frame(f):
        if not finished.is_set():
            seen_before_finish.append(f["text"])

    frames = _post_stream(
        caddr + "/worker_generate_stream", {"model": "supir"}, on_frame=on_frame
    )
    assert [f["text"] for f in frames] == ["a", "ab", "abc", "abcd"]
    assert len(seen_before_finish) >= 2, (
        f"stream buffered: only {seen_before_finish} arrived before completion"
    )


def test_captioner_stream_yields_partials():
    """gen_image_caption_stream yields a growing caption per decode chunk,
    and its final yield equals the non-streaming gen_image_caption."""
    import dataclasses as dc

    import numpy as np

    from supir_tpu.captioner.agent import CaptionerAgent, CaptionerConfig

    cfg = CaptionerConfig.tiny()
    cfg = dc.replace(cfg, max_new_tokens=40)  # >= 2 decode chunks of 16
    agent = CaptionerAgent.create_random(cfg)
    img = np.random.default_rng(0).integers(
        0, 255, (cfg.vision.image_size, cfg.vision.image_size, 3), dtype=np.uint8
    )
    partials = list(agent.gen_image_caption_stream([img], temperature=0.0))
    assert len(partials) >= 2, "expected at least 2 streamed chunks"
    final = agent.gen_image_caption([img], temperature=0.0)
    assert partials[-1] == final


# ---------------------------------------------------------------- web chat


def test_register_worker_and_test_message(live_cluster):
    from supir_tpu.serve.web_chat import register_worker, send_test_message

    caddr, worker = live_cluster
    out = register_worker(caddr, worker.worker_addr)
    assert out["exist"] is True
    msg = send_test_message(caddr, text="ping")
    assert msg["error_code"] == 0
    assert msg["text"] == "echo:ping"


def test_web_chat_roundtrip(live_cluster):
    import urllib.request

    from supir_tpu.serve.web_chat import serve_web_chat

    caddr, worker = live_cluster
    server = serve_web_chat(caddr, host="127.0.0.1", port=0)
    try:
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        page = urllib.request.urlopen(base + "/?session=abc", timeout=10).read()
        assert b"supir" in page  # model dropdown fed by the controller

        boundary = "XtestX"
        parts = []
        for k, v in [("session", "abc"), ("model", "supir"), ("text", "hi there")]:
            parts.append(
                f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"'
                f"\r\n\r\n{v}\r\n"
            )
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="image"; '
            f'filename="x.png"\r\nContent-Type: image/png\r\n\r\nPNGDATA\r\n'
        )
        body = ("".join(parts) + f"--{boundary}--\r\n").encode()
        req = urllib.request.Request(
            base + "/send", data=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        )
        resp = urllib.request.urlopen(req, timeout=10)
        # redirected back to the session page with both turns rendered
        page = resp.read().decode()
        assert "hi there" in page
        assert "echo:hi there" in page
    finally:
        server.shutdown()
