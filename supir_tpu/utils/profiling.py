"""Profiling and observability.

Replaces the reference's ad-hoc `perfcount` decorator + tqdm bars
(tilevae.py:572-594, sampling.py:63-75) with:
  - Phase: wall-clock phase timers with device synchronization that works
    on tunneled TPU platforms (block_until_ready is not sufficient there —
    a tiny host readback is);
  - trace(): context manager around jax.profiler for XLA-level traces;
  - debug_guard(): enables jax nan-debugging (the reference's NaN
    sentinels, devices.py:107-122, as a mode instead of scattered checks).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def sync(x):
    """Force completion of the computation producing x (tunnel-safe)."""
    leaf = jax.tree_util.tree_leaves(x)
    if leaf:
        arr = leaf[0]
        try:
            jax.device_get(arr.ravel()[0] if arr.ndim else arr)
        except Exception:
            jax.block_until_ready(arr)
    return x


class Phase:
    """Accumulating per-phase timers.

    with phases.measure("sample", out):  # syncs on exit
    """

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def measure(self, name: str, result_holder: Optional[list] = None):
        t0 = time.perf_counter()
        yield
        if result_holder:
            sync(result_holder[0])
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        return " ".join(
            f"{k}={v:.3f}s(n={self.counts[k]})" for k, v in self.times.items()
        )


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_guard(nans: bool = True):
    """Debug mode: jax_debug_nans (reference NansException analogue)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", nans)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
