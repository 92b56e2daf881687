"""Captioner web chat UI (stdlib HTTP).

The reference ships a gradio chat server for the LLaVA worker cluster
(`llava/serve/gradio_web_server.py`): model dropdown fed by the
controller's model list, image upload, multi-turn conversation routed via
`get_worker_address` to a worker's `worker_generate_stream`. This is the
same surface on http.server — no gradio dependency, same control-plane
endpoints (supir_tpu/serve/controller.py, worker.py).

Also provides the two small reference utilities:
  - `register_worker(controller, worker)` — manual worker registration
    (llava/serve/register_worker.py)
  - `send_test_message(controller, model, text)` — end-to-end smoke message
    (llava/serve/test_message.py)
"""

from __future__ import annotations

import base64
import html
import json
import threading
import urllib.request
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional


def _post(addr: str, path: str, payload: dict, timeout: float = 600.0) -> dict:
    req = urllib.request.Request(
        addr + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read() or b"{}")


def _post_stream(addr: str, path: str, payload: dict,
                 timeout: float = 600.0) -> dict:
    """POST to a delimiter-framed streaming endpoint; drain the stream and
    return the FINAL payload (non-streaming clients of the streaming
    protocol, like the reference's test_message.py)."""
    from supir_tpu.serve.worker import iter_stream_frames

    req = urllib.request.Request(
        addr + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    last: dict = {}
    with urllib.request.urlopen(req, timeout=timeout) as r:
        for last in iter_stream_frames(r):
            pass
    return last


def register_worker(controller_addr: str, worker_addr: str,
                    check_heart_beat: bool = True) -> dict:
    """Manually (re-)register a worker with the controller
    (register_worker.py:26): query the worker's own status, then forward
    it to the controller's registry."""
    status = _post(worker_addr, "/worker_get_status", {})
    return _post(controller_addr, "/register_worker", {
        "worker_name": worker_addr,
        "check_heart_beat": check_heart_beat,
        "model_names": status.get("model_names", ["supir"]),
        "speed": status.get("speed", 1.0),
        "queue_length": status.get("queue_length", 0),
    })


def send_test_message(controller_addr: str, model_name: Optional[str] = None,
                      text: str = "Tell me a story with more than 1000 words.") -> dict:
    """Round-trip a message through controller dispatch to a worker
    (test_message.py semantics)."""
    models = _post(controller_addr, "/list_models", {}).get("models", [])
    if not models:
        raise RuntimeError("no models registered")
    model = model_name or models[0]
    ret = _post(controller_addr, "/get_worker_address", {"model": model})
    addr = ret.get("address", "")
    if not addr:
        raise RuntimeError(f"no worker for model {model}")
    return _post_stream(addr, "/worker_generate_stream",
                        {"text": text, "prompt": text, "model": model})


_PAGE = """<!doctype html><html><head><title>supir-tpu chat</title><style>
body{{font-family:sans-serif;max-width:820px;margin:2em auto;padding:0 1em}}
.turn{{margin:.6em 0;padding:.6em;border-radius:8px}}
.user{{background:#eef}}.bot{{background:#efe}}
textarea{{width:100%}}img.upload{{max-height:160px}}
</style></head><body>
<h2>supir-tpu captioner chat</h2>
<form method="post" action="/send" enctype="multipart/form-data">
<p>model: <select name="model">{models}</select>
 session: <code>{session}</code>
 <a href="/?session={session}&clear=1">clear</a></p>
<p><input type="file" name="image" accept="image/*"></p>
<textarea name="text" rows="3" placeholder="ask about the image..."></textarea>
<input type="hidden" name="session" value="{session}">
<p><button type="submit">send</button></p>
</form>
<div>{history}</div>
</body></html>"""


def _parse_form(content_type: str, body: bytes) -> Dict[str, bytes]:
    """Parse urlencoded or multipart/form-data bodies with the stdlib email
    parser (the deprecated ``cgi`` module is gone in 3.13)."""
    from urllib.parse import parse_qs

    if "multipart/form-data" not in content_type:
        return {
            k: v[0].encode()
            for k, v in parse_qs(body.decode(errors="replace")).items()
        }
    import email.parser
    import email.policy

    msg = email.parser.BytesParser(policy=email.policy.HTTP).parsebytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body
    )
    fields: Dict[str, bytes] = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name:
            fields[str(name)] = part.get_payload(decode=True) or b""
    return fields


def _text_field(form: Dict[str, bytes], key: str) -> str:
    return form.get(key, b"").decode(errors="replace").strip()


class ChatState:
    def __init__(self):
        self.lock = threading.Lock()
        self.sessions: Dict[str, List[dict]] = {}

    def turns(self, sid: str) -> List[dict]:
        with self.lock:
            return list(self.sessions.get(sid, []))

    def append(self, sid: str, role: str, text: str):
        with self.lock:
            self.sessions.setdefault(sid, []).append({"role": role, "text": text})

    def clear(self, sid: str):
        with self.lock:
            self.sessions.pop(sid, None)


class WebChatHandler(BaseHTTPRequestHandler):
    controller_addr = ""
    state: ChatState = None

    def log_message(self, *a):
        pass

    def _html(self, body: str, code: int = 200):
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _models(self) -> List[str]:
        try:
            return _post(self.controller_addr, "/list_models", {}).get("models", [])
        except Exception:
            return []

    def _render(self, sid: str):
        options = "".join(
            f'<option value="{html.escape(m)}">{html.escape(m)}</option>'
            for m in self._models()
        ) or '<option value="">(no workers)</option>'
        hist = "".join(
            f'<div class="turn {"user" if t["role"] == "user" else "bot"}">'
            f'<b>{t["role"]}:</b> {html.escape(t["text"])}</div>'
            for t in self.state.turns(sid)
        )
        self._html(_PAGE.format(models=options, history=hist, session=sid))

    def do_GET(self):
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(self.path).query)
        sid = q.get("session", [uuid.uuid4().hex[:8]])[0]
        if q.get("clear"):
            self.state.clear(sid)
        self._render(sid)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        form = _parse_form(self.headers.get("Content-Type", ""), body)
        sid = _text_field(form, "session") or uuid.uuid4().hex[:8]
        model = _text_field(form, "model")
        text = _text_field(form, "text")
        payload = {"text": text, "prompt": text, "model": model}
        raw = form.get("image")
        if raw:
            payload["image"] = base64.b64encode(raw).decode()
        self.state.append(sid, "user", text)
        try:
            ret = _post(self.controller_addr, "/get_worker_address",
                        {"model": model})
            addr = ret.get("address", "")
            if not addr:
                reply = "(no worker available)"
            else:
                out = _post_stream(addr, "/worker_generate_stream", payload)
                reply = out.get("text") or out.get("caption") or json.dumps(out)
        except Exception as e:  # surface errors in the chat, like the ref UI
            reply = f"(error: {e})"
        self.state.append(sid, "assistant", reply)
        self.send_response(303)
        self.send_header("Location", f"/?session={sid}")
        self.end_headers()


def serve_web_chat(controller_addr: str, host: str = "0.0.0.0",
                   port: int = 7860):
    handler = type("Handler", (WebChatHandler,), {
        "controller_addr": controller_addr,
        "state": ChatState(),
    })
    server = ThreadingHTTPServer((host, port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def main(argv=None):
    from supir_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    import argparse

    ap = argparse.ArgumentParser("captioner web chat")
    ap.add_argument("--controller", default="http://127.0.0.1:21001")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--register-worker", default=None,
                    help="one-shot: register this worker addr and exit")
    ap.add_argument("--test-message", action="store_true",
                    help="one-shot: send a smoke message and exit")
    args = ap.parse_args(argv)
    if args.register_worker:
        print(json.dumps(register_worker(args.controller, args.register_worker)))
        return
    if args.test_message:
        print(json.dumps(send_test_message(args.controller)))
        return
    server = serve_web_chat(args.controller, args.host, args.port)
    print(f"web chat on http://{args.host}:{args.port} -> {args.controller}")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
