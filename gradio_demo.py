#!/usr/bin/env python
"""Web demo entry point (reference gradio_demo.py surface). gradio is not in
this image, so the default is the dependency-free stdlib UI
(supir_tpu/apps/web_demo.py); with gradio installed the same handlers can
back a Blocks UI."""

import sys

from supir_tpu.apps.web_demo import main

if __name__ == "__main__":
    main(sys.argv[1:])
