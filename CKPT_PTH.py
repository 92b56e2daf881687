"""Checkpoint path constants (reference CKPT_PTH.py surface).

Prefer setting paths in options/*.yaml; these module constants exist for
drop-in familiarity with the reference repo."""

import os

LLAVA_CLIP_PATH = os.environ.get("LLAVA_CLIP_PATH", None)
LLAVA_MODEL_PATH = os.environ.get("LLAVA_MODEL_PATH", None)
SDXL_CLIP1_PATH = os.environ.get("SDXL_CLIP1_PATH", None)
SDXL_CLIP2_CKPT_PTH = os.environ.get("SDXL_CLIP2_CKPT_PTH", None)
