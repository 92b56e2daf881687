#!/usr/bin/env python
"""Batch restoration entry point, flag-compatible with the reference
`test.py` (see SUPIR/test.py:20-105 in Fanghua-Yu/SUPIR). Thin wrapper over
supir_tpu.apps.cli."""

from supir_tpu.apps.cli import main

if __name__ == "__main__":
    main()
