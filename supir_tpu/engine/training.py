"""Training scaffold: sharded diffusion fine-tuning of the SUPIR control
path (control net + decoder adaptors; the SDXL encoder stays frozen via the
stop_gradient already inside LightGLVUNet).

Mirrors `sgm/models/diffusion.py:131-189` (training_step + EMA) but sharded:
parameters FSDP-sharded over the 'model' mesh axis, batch over 'data' —
the ZeRO-3/FSDP pattern of the reference's LLaVA trainer
(llava/train/train.py:110-111,876) expressed as GSPMD shardings.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from supir_tpu.diffusion.loss import diffusion_loss
from supir_tpu.engine.supir import SUPIREngine
from supir_tpu.parallel.sharding import batch_sharding, fsdp_param_shardings, replicated


class EMA:
    """Exponential moving average of a param tree (reference sgm/modules/ema.py)."""

    def __init__(self, decay: float = 0.9999):
        self.decay = decay

    def init(self, params):
        # materialize distinct buffers: the train step donates its input
        # state, and aliased leaves would be donated twice
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)

    def update(self, ema_params, params, step):
        # warmup decay like LitEma: min(decay, (1+step)/(10+step))
        d = jnp.minimum(self.decay, (1.0 + step) / (10.0 + step))
        return jax.tree_util.tree_map(
            lambda e, p: e * d + p * (1.0 - d), ema_params, params
        )


class SUPIRTrainer:
    """Builds a sharded train step over a Mesh('data', 'model')."""

    def __init__(
        self,
        engine: SUPIREngine,
        mesh: Mesh,
        learning_rate: float = 1e-5,
        weight_decay: float = 0.0,
        ema_decay: Optional[float] = 0.9999,
    ):
        self.engine = engine
        self.mesh = mesh
        self.tx = optax.adamw(learning_rate, weight_decay=weight_decay)
        self.ema = EMA(ema_decay) if ema_decay else None

    def trainable_of(self, params):
        return {"control": params["control"], "unet": params["unet"]}

    def init_state(self, params) -> Dict[str, Any]:
        trainable = self.trainable_of(params)
        state = {
            "params": params,
            "opt": self.tx.init(trainable),
            "step": jnp.zeros((), jnp.int32),
        }
        if self.ema:
            state["ema"] = self.ema.init(trainable)
        return state

    def state_shardings(self, state) -> Dict[str, Any]:
        shard = lambda tree: fsdp_param_shardings(tree, self.mesh)
        out = {
            "params": shard(state["params"]),
            "opt": jax.tree_util.tree_map(
                lambda x: (
                    fsdp_param_shardings(x, self.mesh)
                    if hasattr(x, "shape") and x.ndim > 0
                    else replicated(self.mesh)
                ),
                state["opt"],
                is_leaf=lambda x: hasattr(x, "shape"),
            ),
            "step": replicated(self.mesh),
        }
        if "ema" in state:
            out["ema"] = shard(state["ema"])
        return out

    def shard_state(self, state):
        return jax.device_put(state, self.state_shardings(state))

    @functools.cached_property
    def train_step(self):
        engine = self.engine

        def loss_fn(trainable, frozen, z, cond, rng):
            params = {**frozen, **trainable}

            def denoise_fn(noised, sigma, c):
                return engine.denoiser(
                    functools.partial(engine._network, params), noised, sigma, c, 1.0
                )

            return diffusion_loss(denoise_fn, z, cond, rng, weighting="eps")

        def step_fn(state, z, cond, rng):
            params = state["params"]
            trainable = {"control": params["control"], "unet": params["unet"]}
            frozen = {k: v for k, v in params.items() if k not in trainable}
            loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen, z, cond, rng)
            updates, opt = self.tx.update(grads, state["opt"], trainable)
            trainable = optax.apply_updates(trainable, updates)
            new_params = {**frozen, **trainable}
            new_state = {
                "params": new_params,
                "opt": opt,
                "step": state["step"] + 1,
            }
            if self.ema:
                new_state["ema"] = self.ema.update(state["ema"], trainable, state["step"])
            return new_state, loss

        return jax.jit(step_fn, donate_argnums=(0,))

    def make_batch_shardings(self, z, cond):
        zs = batch_sharding(self.mesh, z.ndim)
        cs = {k: batch_sharding(self.mesh, v.ndim) for k, v in cond.items()}
        return zs, cs
