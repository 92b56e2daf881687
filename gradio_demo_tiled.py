#!/usr/bin/env python
"""Tiled 4K+ demo entry (reference gradio_demo_tiled.py surface): the
stdlib web demo with the tiled sampler/VAE config preselected."""

import sys

from supir_tpu.apps.web_demo import main

if __name__ == "__main__":
    main(["--opt", "options/SUPIR_v0_tiled.yaml", "--use_tile_vae",
          "--use_tiled_sampling"] + sys.argv[1:])
