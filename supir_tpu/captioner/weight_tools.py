"""LLaVA weight tools: apply_delta / make_delta / consolidate.

Behavioral contract: `llava/model/apply_delta.py:48`, `make_delta.py:52`,
`consolidate.py:29` — materialize llava weights from llama base + released
delta (and the inverse), and consolidate sharded checkpoints into one file.
Here they operate on safetensors/state-dict level (no HF model classes
needed), so they also run on machines without the 26 GB fp32 tree in RAM.

CLI:
  python -m supir_tpu.captioner.weight_tools apply-delta  --base B --delta D --target T
  python -m supir_tpu.captioner.weight_tools make-delta   --base B --target T --delta D
  python -m supir_tpu.captioner.weight_tools consolidate  --src S --dst D
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from typing import Dict

import numpy as np

# keys allowed to exist only in the delta (multimodal additions)
_DELTA_ONLY_PREFIXES = ("model.mm_projector", "model.vision_tower")
# keys allowed to differ in shape (vocab extensions); base adds into a slice
_RESIZABLE = ("model.embed_tokens.weight", "lm_head.weight")


def load_state_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all weight shards (safetensors/bin) in a file or directory."""
    from supir_tpu.utils.ckpt import load_torch_file

    sd: Dict[str, np.ndarray] = {}
    if os.path.isdir(path):
        names = [f for f in sorted(os.listdir(path))
                 if f.endswith((".safetensors", ".bin", ".pt"))]
        if not names:
            raise FileNotFoundError(f"no weight files in {path}")
        for f in names:
            sd.update(load_torch_file(os.path.join(path, f)))
    else:
        sd = dict(load_torch_file(path))
    return {k: _np(v) for k, v in sd.items()}


def _np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v)


def apply_delta_sd(base: Dict[str, np.ndarray], delta: Dict[str, np.ndarray]):
    """target = delta + base (reference apply_delta.py:13-37): delta-only
    keys pass through; resizable keys add base into the leading slice."""
    out = {}
    for name, dparam in delta.items():
        if name not in base:
            assert name.startswith(_DELTA_ONLY_PREFIXES), f"{name} not in base model"
            out[name] = dparam
            continue
        bparam = base[name]
        if dparam.shape == bparam.shape:
            out[name] = dparam + bparam
        else:
            assert name in _RESIZABLE, (
                f"{name} dimension mismatch: {dparam.shape} vs {bparam.shape}"
            )
            t = dparam.copy()
            t[: bparam.shape[0], : bparam.shape[1]] += bparam
            out[name] = t
    return out


def make_delta_sd(base: Dict[str, np.ndarray], target: Dict[str, np.ndarray]):
    """delta = target - base (reference make_delta.py), inverse of apply."""
    out = {}
    for name, tparam in target.items():
        if name not in base:
            assert name.startswith(_DELTA_ONLY_PREFIXES), f"{name} not in base model"
            out[name] = tparam
            continue
        bparam = base[name]
        if tparam.shape == bparam.shape:
            out[name] = tparam - bparam
        else:
            assert name in _RESIZABLE, (
                f"{name} dimension mismatch: {tparam.shape} vs {bparam.shape}"
            )
            d = tparam.copy()
            d[: bparam.shape[0], : bparam.shape[1]] -= bparam
            out[name] = d
    return out


def save_state_dir(sd: Dict[str, np.ndarray], path: str, src_dir: str = None):
    """Write one consolidated model.safetensors (+ copy config/tokenizer
    sidecar files from src_dir, like HF save_pretrained keeps them)."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(path, "model.safetensors"))
    if src_dir and os.path.isdir(src_dir):
        for f in os.listdir(src_dir):
            if f.endswith((".json", ".model", ".txt")) and not f.endswith(
                ".safetensors.index.json"
            ):
                shutil.copy2(os.path.join(src_dir, f), os.path.join(path, f))


def apply_delta(base_path: str, delta_path: str, target_path: str):
    base = load_state_dir(base_path)
    delta = load_state_dir(delta_path)
    target = apply_delta_sd(base, delta)
    save_state_dir(target, target_path, src_dir=delta_path)
    print(f"apply-delta: wrote {len(target)} tensors to {target_path}")


def make_delta(base_path: str, target_path: str, delta_path: str):
    base = load_state_dir(base_path)
    target = load_state_dir(target_path)
    delta = make_delta_sd(base, target)
    save_state_dir(delta, delta_path, src_dir=target_path)
    print(f"make-delta: wrote {len(delta)} tensors to {delta_path}")


def consolidate(src_path: str, dst_path: str):
    """Merge sharded weight files into one model.safetensors
    (reference consolidate.py:29 without the HF round-trip)."""
    sd = load_state_dir(src_path)
    save_state_dir(sd, dst_path, src_dir=src_path)
    print(f"consolidate: wrote {len(sd)} tensors to {dst_path}")


def main(argv=None):
    from supir_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    ap = argparse.ArgumentParser("llava weight tools")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("apply-delta")
    p.add_argument("--base", required=True)
    p.add_argument("--delta", required=True)
    p.add_argument("--target", required=True)
    p = sub.add_parser("make-delta")
    p.add_argument("--base", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--delta", required=True)
    p = sub.add_parser("consolidate")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    args = ap.parse_args(argv)
    if args.cmd == "apply-delta":
        apply_delta(args.base, args.delta, args.target)
    elif args.cmd == "make-delta":
        make_delta(args.base, args.target, args.delta)
    else:
        consolidate(args.src, args.dst)


if __name__ == "__main__":
    main()
