"""Model worker: registers with the controller, heartbeats, serves
restoration/caption requests with a concurrency limit.

Behavioral contract: `llava/serve/model_worker.py:44-230` — registration at
startup, heartbeat every 15 s carrying queue length, semaphore-limited
generate, OOM/ValueError caught into error payloads.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
import urllib.request
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

from supir_tpu.serve.controller import WORKER_HEART_BEAT_INTERVAL

ErrorCode_OOM = 1
ErrorCode_ERROR = 2


class ModelWorker:
    def __init__(
        self,
        controller_addr: str,
        worker_addr: str,
        work_fn: Callable[[dict], dict],
        model_names=("supir",),
        limit_concurrency: int = 2,
        register: bool = True,
    ):
        self.controller_addr = controller_addr
        self.worker_addr = worker_addr
        self.worker_id = str(uuid.uuid4())[:8]
        self.work_fn = work_fn
        self.model_names = list(model_names)
        self.semaphore = threading.Semaphore(limit_concurrency)
        self.active = 0
        self.lock = threading.Lock()
        self._stop = threading.Event()
        if register:
            self.register_to_controller()
            self.heart_beat_thread = threading.Thread(
                target=self._heart_beat_loop, daemon=True
            )
            self.heart_beat_thread.start()

    # -------------------------------------------------------- control plane

    def _post(self, path: str, payload: dict) -> dict:
        req = urllib.request.Request(
            self.controller_addr + path,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=15) as r:
            return json.loads(r.read())

    def register_to_controller(self):
        self._post(
            "/register_worker",
            {
                "worker_name": self.worker_addr,
                "model_names": self.model_names,
                "check_heart_beat": True,
                "queue_length": self.queue_length(),
            },
        )

    def _heart_beat_loop(self):
        while not self._stop.wait(WORKER_HEART_BEAT_INTERVAL):
            try:
                ok = self._post(
                    "/receive_heart_beat",
                    {"worker_name": self.worker_addr, "queue_length": self.queue_length()},
                )
                if not ok.get("exist"):
                    self.register_to_controller()  # model_worker.py:98-104
            except Exception:
                pass

    def queue_length(self) -> int:
        with self.lock:
            return self.active

    def stop(self):
        self._stop.set()

    # -------------------------------------------------------- inference

    def generate(self, params: dict) -> dict:
        """Blocking generate: drains the stream, returns the final payload."""
        last = {"text": "", "error_code": ErrorCode_ERROR, "error": "empty"}
        for last in self.generate_stream(params):
            pass
        return last

    def generate_stream(self, params: dict):
        """Semaphore-limited streaming generate (model_worker.py:123-193):
        yields payload dicts as the work function produces them. A work_fn
        that returns a generator streams; a plain-dict work_fn yields once."""
        acquired = self.semaphore.acquire(timeout=60)
        if not acquired:
            yield {"text": "", "error_code": ErrorCode_ERROR, "error": "busy"}
            return
        with self.lock:
            self.active += 1
        try:
            out = self.work_fn(params)
            if hasattr(out, "__next__"):  # generator work_fn -> stream
                yield from out
            else:
                yield out
        except MemoryError as e:
            yield {"text": "", "error_code": ErrorCode_OOM, "error": str(e)}
        except Exception as e:  # model_worker.py:194-223
            yield {"text": "", "error_code": ErrorCode_ERROR, "error": str(e)}
        finally:
            with self.lock:
                self.active -= 1
            self.semaphore.release()


class WorkerHandler(BaseHTTPRequestHandler):
    worker: ModelWorker = None

    def log_message(self, *a):
        pass

    def _json(self, code, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        data = json.loads(self.rfile.read(n) or b"{}")
        if self.path == "/worker_generate_stream":
            # delimiter-framed streaming (reference model_worker.py:123-193:
            # each partial payload is json + b"\0"); connection close ends
            # the body (HTTP/1.0 semantics — no Content-Length up front)
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.end_headers()
            try:
                for chunk in self.worker.generate_stream(data):
                    self.wfile.write(json.dumps(chunk).encode() + b"\0")
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away mid-stream
        elif self.path == "/worker_get_status":
            self._json(
                200,
                {
                    "model_names": self.worker.model_names,
                    "speed": 1,
                    "queue_length": self.worker.queue_length(),
                },
            )
        else:
            self._json(404, {"error": "unknown endpoint"})


def serve_worker(worker: ModelWorker, host: str = "0.0.0.0", port: int = 21002):
    handler = type("Handler", (WorkerHandler,), {"worker": worker})
    return ThreadingHTTPServer((host, port), handler)


def caption_work_fn(captioner):
    """Streaming work_fn serving caption requests (the reference
    ModelWorker's generate_stream for LLaVA, model_worker.py:123-193):
    yields the growing partial caption after every decode chunk, so
    clients see tokens on the wire instead of one blob after ~10 s."""
    import numpy as np
    from PIL import Image

    def work(params: dict):
        img = Image.open(io.BytesIO(base64.b64decode(params["image"]))).convert("RGB")
        for partial in captioner.gen_image_caption_stream(
            [np.asarray(img)],
            temperature=float(params.get("temperature", 0.2)),
            top_p=float(params.get("top_p", 0.7)),
            qs=params.get("prompt") or None,
        ):
            yield {"text": partial[0], "error_code": 0}

    return work


def iter_stream_frames(resp, block: int = 4096):
    """Parse a delimiter-framed response into payload dicts as bytes
    arrive (client side of the b"\\0" protocol). `resp` is any object
    with read1/read returning b"" at EOF."""
    read1 = getattr(resp, "read1", None) or resp.read
    buf = b""
    while True:
        b = read1(block)
        if not b:
            break
        buf += b
        while b"\0" in buf:
            frame, buf = buf.split(b"\0", 1)
            if frame:
                yield json.loads(frame)
    if buf.strip():
        # a connection dropped mid-frame (proxy exception after headers)
        # leaves a truncated tail — surface a clean error frame instead of
        # raising json.JSONDecodeError in every client
        try:
            yield json.loads(buf)
        except json.JSONDecodeError:
            yield {"text": "", "error_code": 1,
                   "error": "stream truncated mid-frame"}


def main(argv=None):
    from supir_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    """Launch a restoration worker and register with the controller."""
    import argparse
    import threading

    ap = argparse.ArgumentParser("supir-tpu model worker")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=21002)
    ap.add_argument("--controller", default="http://127.0.0.1:21001")
    ap.add_argument("--worker-address", default=None)
    ap.add_argument("--opt", default="options/SUPIR_v0.yaml")
    ap.add_argument("--limit-concurrency", type=int, default=2)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--random_weights", action="store_true")
    args = ap.parse_args(argv)

    from supir_tpu.apps.cli import create_engine_from_args

    class _A:
        tiny = args.tiny
        opt = args.opt
        SUPIR_sign = "Q"
        random_weights = args.random_weights

    engine, cfg = create_engine_from_args(_A)
    addr = args.worker_address or f"http://127.0.0.1:{args.port}"
    worker = ModelWorker(
        args.controller, addr, restoration_work_fn(engine, cfg),
        limit_concurrency=args.limit_concurrency,
    )
    httpd = serve_worker(worker, args.host, args.port)
    print(f"worker {addr} registered with {args.controller}")
    httpd.serve_forever()


def restoration_work_fn(engine, cfg):
    """Build a work_fn serving base64-PNG restoration requests."""
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from supir_tpu.utils.image import array_to_pil, pil_to_array
    from supir_tpu.utils.tokenizer import tokenize

    def work(params: dict) -> dict:
        img_b64 = params["image"]
        img = Image.open(io.BytesIO(base64.b64decode(img_b64))).convert("RGB")
        arr, h0, w0 = pil_to_array(
            img, upscale=params.get("upscale", 1.0), min_size=params.get("min_size", 1024)
        )
        x = jnp.asarray(arr)[None]
        z = engine.encode_first_stage_with_denoise(x)
        prompt = params.get("prompt", "") + cfg.p_p
        tok_p = jnp.asarray(tokenize([prompt]))
        tok_n = jnp.asarray(tokenize([cfg.n_p]))
        c, uc = engine.prepare_condition(z, tok_p, tok_p, tok_n, tok_n)
        out = engine.batchify_sample(
            x, c, uc,
            num_steps=int(params.get("edm_steps", 50)),
            cfg_scale=float(params.get("s_cfg", 7.5)),
            seed=int(params.get("seed", 0)),
            color_fix_type=params.get("color_fix_type", "Wavelet"),
            z_override=z,
        )
        pil = array_to_pil(np.asarray(out[0]), h0, w0)
        buf = io.BytesIO()
        pil.save(buf, format="PNG")
        return {
            "image": base64.b64encode(buf.getvalue()).decode(),
            "error_code": 0,
        }

    return work


if __name__ == "__main__":
    main()
