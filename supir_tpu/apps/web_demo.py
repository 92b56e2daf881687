"""Web demo — the reference gradio_demo.py surface without the gradio
dependency (not in this image): a stdlib HTTP app serving a single-page UI
with the three-stage flow (Stage1 denoise / caption / Stage2 restore),
Quality/Fidelity presets, per-event history + feedback logging
(gradio_demo.py:90-186).

If gradio IS installed, `launch_gradio()` builds the equivalent Blocks UI.
"""

from __future__ import annotations

import base64
import io
import json
import os
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

INDEX_HTML = """<!doctype html>
<html><head><title>supir-tpu</title><style>
body{font-family:sans-serif;max-width:1100px;margin:2em auto}
img{max-width:520px;border:1px solid #ccc}
.row{display:flex;gap:1em}.col{flex:1}
label{display:block;margin-top:.5em}
</style></head><body>
<h2>SUPIR-TPU — photo-realistic image restoration</h2>
<input type="file" id="file" accept="image/*">
<div class="row">
 <div class="col">
  <label>Prompt <input id="prompt" size="50" value=""></label>
  <label>Steps <input id="steps" type="number" value="50"></label>
  <label>CFG <input id="cfg" type="number" step="0.5" value="7.5"></label>
  <label>Upscale <input id="upscale" type="number" step="0.5" value="2"></label>
  <label>Gamma <input id="gamma" type="number" step="0.1" min="0.1" max="2" value="1"></label>
  <label>Preset <select id="preset"><option>Quality</option><option>Fidelity</option></select></label>
  <label>Model <select id="model"><option>Q</option><option>F</option></select></label>
  <label>Color fix <select id="colorfix"><option>Wavelet</option><option>AdaIn</option><option>None</option></select></label>
  <button onclick="run('stage1')">Stage 1 (denoise)</button>
  <button onclick="run('caption')">Caption</button>
  <button onclick="run('stage2')">Stage 2 (restore)</button>
  <p id="status"></p><p id="caption"></p>
 </div>
 <div class="col"><h4>Input</h4><img id="inimg"></div>
 <div class="col"><h4>Output</h4><img id="outimg">
  <div><button onclick="feedback(1)">&#128077;</button>
  <button onclick="feedback(-1)">&#128078;</button></div></div>
</div>
<script>
let lastEvent = null;
document.getElementById('file').onchange = e => {
  const r = new FileReader();
  r.onload = () => document.getElementById('inimg').src = r.result;
  r.readAsDataURL(e.target.files[0]);
};
async function run(stage){
  const img = document.getElementById('inimg').src;
  if(!img){alert('load an image');return}
  document.getElementById('status').textContent = stage + ' running...';
  const body = {stage, image: img.split(',')[1],
    prompt: document.getElementById('prompt').value,
    edm_steps: +document.getElementById('steps').value,
    s_cfg: +document.getElementById('cfg').value,
    upscale: +document.getElementById('upscale').value,
    gamma_correction: +document.getElementById('gamma').value,
    preset: document.getElementById('preset').value,
    model_select: document.getElementById('model').value,
    color_fix_type: document.getElementById('colorfix').value};
  const t0 = performance.now();
  const res = await fetch('/api/' + stage, {method:'POST', body: JSON.stringify(body)});
  const out = await res.json();
  lastEvent = out.event_id;
  document.getElementById('status').textContent =
    stage + ' done in ' + ((performance.now()-t0)/1000).toFixed(1) + 's';
  if(out.caption !== undefined) document.getElementById('caption').textContent = out.caption;
  if(out.image) document.getElementById('outimg').src = 'data:image/png;base64,' + out.image;
}
async function feedback(score){
  if(!lastEvent) return;
  await fetch('/api/feedback', {method:'POST',
    body: JSON.stringify({event_id: lastEvent, score})});
}
</script></body></html>"""

PRESETS = {
    # default_setting block (options/SUPIR_v0.yaml:157-163)
    "Quality": dict(s_cfg=7.5, spt_linear_CFG=4.0),
    "Fidelity": dict(s_cfg=4.0, spt_linear_CFG=1.0),
}


class DemoServer:
    def __init__(self, engine, cfg, captioner=None, history_dir="./history",
                 param_sets=None, active_sign="Q"):
        """param_sets: optional {'Q': params_or_loader, 'F': ...} for runtime
        checkpoint hot-swap (reference gradio_demo.py:52,99-107 keeps both
        state dicts in RAM). A value may be a zero-arg callable for lazy
        load (e.g. an orbax cache, utils/checkpoint.convert_and_cache)."""
        self.engine = engine
        self.cfg = cfg
        self.captioner = captioner
        self.history_dir = history_dir
        self.param_sets = param_sets or {}
        self.active_sign = active_sign
        os.makedirs(history_dir, exist_ok=True)

    def select_model(self, sign: str) -> str:
        """Hot-swap the engine's parameter tree to checkpoint `sign`."""
        if sign == self.active_sign:
            return sign
        if sign not in self.param_sets:
            raise ValueError(
                f"unknown checkpoint {sign!r}; available: {sorted(self.param_sets)}"
            )
        params = self.param_sets[sign]
        if callable(params):
            params = params()
            self.param_sets[sign] = params  # materialize once, keep in RAM
        # keep the previous tree in param_sets so swapping back is instant
        self.param_sets.setdefault(self.active_sign, self.engine.params)
        self.engine.params = params
        self.active_sign = sign
        return sign

    def _log_event(self, kind, params, images: dict) -> str:
        event_id = time.strftime("%Y%m%d_%H%M%S") + "_" + uuid.uuid4().hex[:6]
        d = os.path.join(self.history_dir, event_id)
        os.makedirs(d, exist_ok=True)
        clean = {k: v for k, v in params.items() if k != "image"}
        with open(os.path.join(d, "params.json"), "w") as f:
            json.dump({"kind": kind, **clean}, f, indent=2)
        for name, img in images.items():
            img.save(os.path.join(d, name + ".png"))
        return event_id

    def feedback(self, event_id: str, score: int):
        d = os.path.join(self.history_dir, event_id)
        if os.path.isdir(d):
            with open(os.path.join(d, "feedback.json"), "w") as f:
                json.dump({"score": score, "ts": time.time()}, f)
            return True
        return False

    # ------------------------------------------------------------ stages

    def _decode_image(self, params):
        from PIL import Image

        raw = base64.b64decode(params["image"])
        return Image.open(io.BytesIO(raw)).convert("RGB")

    def stage1(self, params: dict) -> dict:
        import jax.numpy as jnp
        from PIL import Image

        from supir_tpu.utils.image import array_to_pil, pil_to_array

        img = self._decode_image(params)
        arr, h0, w0 = pil_to_array(img, upscale=1.0, min_size=512, fix_resize=512,
                                   gamma=float(params.get("gamma_correction", 1.0)))
        x = jnp.asarray(arr)[None]
        out = self.engine.batchify_denoise(x)
        pil = array_to_pil(np.asarray(out[0]))
        event_id = self._log_event("stage1", params, {"in": img, "out": pil})
        buf = io.BytesIO()
        pil.save(buf, format="PNG")
        return {"image": base64.b64encode(buf.getvalue()).decode(), "event_id": event_id}

    def caption(self, params: dict) -> dict:
        img = self._decode_image(params)
        if self.captioner is None:
            return {"caption": "", "event_id": "", "error": "captioner unavailable"}
        cap = self.captioner.gen_image_caption([np.asarray(img)])[0]
        event_id = self._log_event("caption", {**params, "caption": cap}, {"in": img})
        return {"caption": cap, "event_id": event_id}

    def stage2(self, params: dict) -> dict:
        import jax.numpy as jnp

        from supir_tpu.utils.image import array_to_pil, pil_to_array
        from supir_tpu.utils.tokenizer import tokenize

        img = self._decode_image(params)
        if params.get("model_select"):
            self.select_model(params["model_select"])
        preset = PRESETS.get(params.get("preset", "Quality"), PRESETS["Quality"])
        arr, h0, w0 = pil_to_array(
            img, upscale=float(params.get("upscale", 1.0)),
            min_size=int(params.get("min_size", 1024)),
            gamma=float(params.get("gamma_correction", 1.0)),
        )
        x = jnp.asarray(arr)[None]
        z = self.engine.encode_first_stage_with_denoise(x)
        prompt = params.get("prompt", "") + self.cfg.p_p
        tok_p = jnp.asarray(tokenize([prompt]))
        tok_n = jnp.asarray(tokenize([self.cfg.n_p]))
        c, uc = self.engine.prepare_condition(z, tok_p, tok_p, tok_n, tok_n)
        out = self.engine.batchify_sample(
            x, c, uc,
            num_steps=int(params.get("edm_steps", 50)),
            cfg_scale=float(params.get("s_cfg", preset["s_cfg"])),
            use_linear_cfg=True,
            cfg_scale_start=preset["spt_linear_CFG"],
            color_fix_type=params.get("color_fix_type", "Wavelet"),
            seed=int(params.get("seed", 0)),
            z_override=z,
        )
        pil = array_to_pil(np.asarray(out[0]), h0, w0)
        event_id = self._log_event("stage2", params, {"in": img, "out": pil})
        buf = io.BytesIO()
        pil.save(buf, format="PNG")
        return {"image": base64.b64encode(buf.getvalue()).decode(), "event_id": event_id}


def serve_demo(demo: DemoServer, host="0.0.0.0", port=7860):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = INDEX_HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            params = json.loads(self.rfile.read(n) or b"{}")
            try:
                if self.path == "/api/stage1":
                    out = demo.stage1(params)
                elif self.path == "/api/caption":
                    out = demo.caption(params)
                elif self.path == "/api/stage2":
                    out = demo.stage2(params)
                elif self.path == "/api/feedback":
                    out = {"ok": demo.feedback(params["event_id"], params["score"])}
                else:
                    out = {"error": "unknown endpoint"}
            except Exception as e:
                out = {"error": str(e)}
            body = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    from supir_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    import argparse

    from supir_tpu.apps.cli import build_parser, create_engine_from_args

    ap = build_parser()
    ap.add_argument("--port", type=int, default=7860)
    # web demo has no required dirs
    argv = argv or []
    if "--img_dir" not in argv:
        argv = ["--img_dir", "/tmp", "--save_dir", "/tmp"] + list(argv)
    args = ap.parse_args(argv)
    engine, cfg = create_engine_from_args(args)

    # runtime Q<->F hot-swap (gradio_demo.py:99-107): expose the *other*
    # checkpoint as a lazy loader when its torch file is present
    param_sets = {args.SUPIR_sign: engine.params}
    if not args.tiny:
        from supir_tpu.config import load_yaml_config

        _, extras = load_yaml_config(args.opt)
        other = "F" if args.SUPIR_sign == "Q" else "Q"
        sdxl = extras.get("SDXL_CKPT")
        sp = extras.get(f"SUPIR_CKPT_{other}")
        if sdxl and sp and os.path.exists(sdxl) and os.path.exists(sp):
            from supir_tpu.utils.checkpoint import convert_and_cache

            param_sets[other] = lambda: convert_and_cache(
                cfg, sdxl, sp, cache_dir=".ckpt_cache", sign=other
            )
    demo = DemoServer(engine, cfg, param_sets=param_sets,
                      active_sign=args.SUPIR_sign)
    httpd = serve_demo(demo, port=args.port)
    print(f"demo on http://0.0.0.0:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
