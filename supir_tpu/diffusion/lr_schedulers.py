"""LR schedulers (reference sgm/lr_scheduler.py:4-135), as optax schedules.

All return a multiplier f(step) to compose with a base LR
(optax.scale_by_schedule or learning_rate=lambda s: base * f(s)).
"""

from __future__ import annotations

import numpy as np


def lambda_warmup_cosine(warm_up_steps, lr_min, lr_max, lr_start, max_decay_steps):
    """Warmup lr_start->lr_max then cosine to lr_min (LambdaWarmUpCosineScheduler)."""

    def f(step):
        step = np.asarray(step, np.float64)
        warm = lr_start + (lr_max - lr_start) / max(warm_up_steps, 1) * step
        t = (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1)
        t = np.minimum(t, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + np.cos(t * np.pi))
        return np.where(step < warm_up_steps, warm, cos)

    return f


def lambda_warmup_cosine2(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    """Cycled variant (LambdaWarmUpCosineScheduler2)."""
    cum = np.cumsum([0] + list(cycle_lengths))

    def find_cycle(step):
        return int(np.searchsorted(cum[1:], step, side="right"))

    def f(step):
        c = find_cycle(step)
        c = min(c, len(cycle_lengths) - 1)
        s = step - cum[c]
        if s < warm_up_steps[c]:
            return f_start[c] + (f_max[c] - f_start[c]) / max(warm_up_steps[c], 1) * s
        t = (s - warm_up_steps[c]) / max(cycle_lengths[c] - warm_up_steps[c], 1)
        t = min(t, 1.0)
        return f_min[c] + 0.5 * (f_max[c] - f_min[c]) * (1 + np.cos(t * np.pi))

    return f


def lambda_linear(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    """Warmup then linear decay per cycle (LambdaLinearScheduler)."""
    cum = np.cumsum([0] + list(cycle_lengths))

    def f(step):
        c = int(np.searchsorted(cum[1:], step, side="right"))
        c = min(c, len(cycle_lengths) - 1)
        s = step - cum[c]
        if s < warm_up_steps[c]:
            return f_start[c] + (f_max[c] - f_start[c]) / max(warm_up_steps[c], 1) * s
        return f_min[c] + (f_max[c] - f_min[c]) * (cycle_lengths[c] - s) / cycle_lengths[c]

    return f
