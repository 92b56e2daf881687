"""Native checkpoint save/load (orbax) + Q/F hot-swap.

The reference re-reads and layers torch state dicts on every model build
(SUPIR/util.py:34-51) and keeps both Q and F dicts in host RAM for runtime
swapping (gradio_demo.py:52,99-107). Here conversion happens once; the
converted pytree is stored as an orbax checkpoint and memory-mapped on
load. Q/F swap = loading a different orbax directory (or keeping both
trees and swapping references).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_params(path: str, params: Any):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), target
        )
        return ckptr.restore(path, shapes)
    return ckptr.restore(path)


def convert_and_cache(
    cfg,
    sdxl_path: str,
    supir_path: Optional[str],
    cache_dir: str,
    sign: str = "Q",
):
    """Torch ckpts -> converted orbax cache (one-time); returns params."""
    cache = os.path.join(cache_dir, f"supir_{sign}")
    if os.path.isdir(cache):
        return load_params(cache)
    from supir_tpu.utils.ckpt import load_supir_checkpoint

    params, report = load_supir_checkpoint(cfg, sdxl_path, supir_path)
    print(f"converted ({report.summary()}); caching to {cache}")
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(jnp.asarray, params)
    save_params(cache, params)
    return params
