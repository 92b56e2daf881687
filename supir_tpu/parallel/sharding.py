"""Sharding rules: FSDP-style parameter sharding + batch data parallelism.

Replaces the reference's DeepSpeed ZeRO-3 / FSDP training setup
(llava/train/train.py:110-111,876) with `jax.sharding.NamedSharding`
annotations: each parameter's largest divisible axis is sharded over the
'model' mesh axis; XLA turns that into all-gather-on-use / reduce-scatter-
on-grad — the ZeRO-3 pattern, compiler-scheduled over ICI.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def _fsdp_spec(shape, model_size: int) -> P:
    """Shard the largest axis divisible by the model-axis size.

    Small params (biases, norm scales) stay replicated — sharding them
    costs more in collective latency than it saves in HBM.
    """
    if model_size <= 1 or not shape:
        return P()
    best = None
    for i, d in enumerate(sorted(range(len(shape)), key=lambda i: -shape[i])):
        if shape[d] >= 2 * model_size and shape[d] % model_size == 0:
            best = d
            break
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = "model"
    return P(*spec)


def fsdp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """A NamedSharding pytree matching `params`."""
    model_size = mesh.shape.get("model", 1)

    def one(x):
        return NamedSharding(mesh, _fsdp_spec(x.shape, model_size))

    return jax.tree_util.tree_map(one, params)
