"""Device mesh construction.

Axis convention (SURVEY.md section 2.6):
  data  — batch / CFG-duplicate data parallelism
  tile  — spatial tiles of tiled diffusion / tiled VAE (sequence-parallel
          analogue: SUPIR's long-context axis is resolution)
  model — parameter sharding (FSDP/TP hybrid) for training and the LLaVA
          captioner's tensor parallelism

The reference has no collectives of its own (single-process CUDA inference,
SURVEY.md section 2.6); every strategy here is a TPU re-expression: XLA
inserts psum/all-gather over ICI from sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a Mesh over the given (or all) devices.

    axis_sizes=None puts every device on the first axis.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),) + (1,) * (len(axis_names) - 1)
    need = int(np.prod(axis_sizes))
    if need > len(devices):
        raise ValueError(f"axis sizes {axis_sizes} need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(axis_sizes)
    return Mesh(arr, tuple(axis_names))


def data_tile_model_mesh(dp: int, tile: int, model: int) -> Mesh:
    return make_mesh((dp, tile, model), ("data", "tile", "model"))
