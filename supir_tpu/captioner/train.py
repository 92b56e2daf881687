"""Captioner (LLaVA-style) training scaffold.

Behavioral contract: `llava/train/train.py` + `llava_trainer.py` — causal-LM
cross-entropy on conversation data with image-patch splicing, DeepSpeed
ZeRO-3/FSDP sharding, selective mm-projector-only tuning
(`--tune_mm_mlp_adapter`, train.py:133-142 / llava_trainer.py:150-169),
modality-grouped length sampler (see captioner/data.py).

TPU re-expression: FSDP = NamedSharding over Mesh('data','model') (the
same GSPMD pattern as engine/training.py); the trainable subset is a
pytree filter; batches come from `data.rank_batches`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from supir_tpu.captioner.agent import CaptionerAgent
from supir_tpu.parallel.sharding import batch_sharding, fsdp_param_shardings, replicated

IGNORE_INDEX = -100
LORA_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj",
                "gate_proj", "up_proj", "down_proj")


def init_lora(llama_params, rank: int = 64, rng=None, targets=LORA_TARGETS):
    """Low-rank adapters for every target projection: a [in,r] (gaussian),
    b [r,out] (zeros) — the reference's peft-LoRA surface
    (llava/train/train.py:100-104, find_all_linear_names:163)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    counter = [0]

    def walk(node):
        if not isinstance(node, dict):
            return None
        out = {}
        for k, v in node.items():
            if k in targets and isinstance(v, dict) and "Dense_0" in v:
                w = v["Dense_0"]["kernel"]
                counter[0] += 1
                key = jax.random.fold_in(rng, counter[0])
                out[k] = {
                    "a": jax.random.normal(key, (w.shape[0], rank), jnp.float32)
                    * (1.0 / rank),
                    "b": jnp.zeros((rank, w.shape[1]), jnp.float32),
                }
            else:
                sub = walk(v)
                if sub:
                    out[k] = sub
        return out

    return walk(llama_params)


def merge_lora(llama_params, lora, alpha: float = 16.0, rank: int = 64):
    """params with kernel += (alpha/rank) * a @ b at each adapted site."""
    scale = alpha / rank

    def walk(p, l):
        if not isinstance(p, dict):
            return p
        out = {}
        for k, v in p.items():
            if l is not None and k in l and "a" in l[k]:
                w = v["Dense_0"]["kernel"]
                out[k] = {"Dense_0": {
                    **v["Dense_0"],
                    "kernel": w + scale * (l[k]["a"] @ l[k]["b"]).astype(w.dtype),
                }}
            else:
                out[k] = walk(v, l.get(k) if isinstance(l, dict) else None)
        return out

    return walk(llama_params, lora)


def causal_lm_loss(logits, labels):
    """Next-token CE, IGNORE_INDEX masked (llava preprocess convention:
    non-assistant tokens are masked out, train.py:302-624)."""
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    mask = targets != IGNORE_INDEX
    safe = jnp.where(mask, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


class CaptionerTrainer:
    """Sharded trainer; mode='full' | 'projector' (mm-adapter only)."""

    def __init__(
        self,
        agent: CaptionerAgent,
        mesh: Mesh,
        learning_rate: float = 2e-5,
        mode: str = "full",
        lora_rank: int = 64,
        lora_alpha: float = 16.0,
    ):
        assert mode in ("full", "projector", "lora")
        self.agent = agent
        self.mesh = mesh
        self.mode = mode
        self.lora_rank = lora_rank
        self.lora_alpha = lora_alpha
        self.tx = optax.adamw(learning_rate)

    def trainable_of(self, params):
        if self.mode == "projector":
            return {"projector": params["projector"]}
        if self.mode == "lora":
            return {"projector": params["projector"], "lora": params["lora"]}
        return {"projector": params["projector"], "llama": params["llama"]}

    def init_state(self, params, rng=None):
        if self.mode == "lora" and "lora" not in params:
            params = dict(
                params, lora=init_lora(params["llama"], self.lora_rank, rng)
            )
        trainable = self.trainable_of(params)
        return {
            "params": params,
            "opt": self.tx.init(trainable),
            "step": jnp.zeros((), jnp.int32),
        }

    def shard_state(self, state):
        sh = {
            "params": fsdp_param_shardings(state["params"], self.mesh),
            "opt": jax.tree_util.tree_map(
                lambda x: (
                    fsdp_param_shardings(x, self.mesh)
                    if hasattr(x, "shape") and getattr(x, "ndim", 0) > 0
                    else replicated(self.mesh)
                ),
                state["opt"],
                is_leaf=lambda x: hasattr(x, "shape"),
            ),
            "step": replicated(self.mesh),
        }
        return jax.device_put(state, sh)

    @functools.cached_property
    def train_step(self):
        agent = self.agent
        llama = agent.llama
        projector = agent.projector
        mode = self.mode
        lora_alpha, lora_rank = self.lora_alpha, self.lora_rank

        def forward(params, image_feats, pre_embeds, post_embeds, labels):
            """image_feats: raw vision patch features [B, P, Dv] (vision
            tower is always frozen, like the reference); pre/post are token
            embeddings around the image splice."""
            img_emb = projector.apply({"params": params["projector"]}, image_feats)
            embeds = jnp.concatenate([pre_embeds, img_emb, post_embeds], axis=1)
            pos = jnp.broadcast_to(
                jnp.arange(embeds.shape[1]), embeds.shape[:2]
            )
            llama_p = params["llama"]
            if mode == "lora":
                llama_p = merge_lora(llama_p, params["lora"], lora_alpha, lora_rank)
            logits, _ = llama.apply({"params": llama_p}, embeds, pos)
            return causal_lm_loss(logits, labels)

        def loss_fn(trainable, frozen, batch):
            params = {**frozen, **trainable}
            return forward(
                params, batch["image_feats"], batch["pre_embeds"],
                batch["post_embeds"], batch["labels"],
            )

        def step_fn(state, batch):
            params = state["params"]
            trainable = self.trainable_of(params)
            frozen = {k: v for k, v in params.items() if k not in trainable}
            loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen, batch)
            updates, opt = self.tx.update(grads, state["opt"], trainable)
            trainable = optax.apply_updates(trainable, updates)
            return {
                "params": {**frozen, **trainable},
                "opt": opt,
                "step": state["step"] + 1,
            }, loss

        return jax.jit(step_fn, donate_argnums=(0,))

    @functools.cached_property
    def train_step_tokens(self):
        """Token-level train step consuming `preprocess.collate` batches
        directly: {input_ids [B,T] (one IMAGE_TOKEN_INDEX marker per image
        sample), labels [B,T], images [B,S,S,3]}.

        The image splice is done in-graph with static shapes (output length
        T+P-1 regardless of marker position) — the TPU re-expression of the
        reference's per-sample python splice
        (llava_arch.py:95-213 prepare_inputs_labels_for_multimodal). The
        vision tower is frozen (stop_gradient), like the reference; the
        token-embedding table lives inside the graph so 'full' mode trains
        it."""
        from supir_tpu.captioner.preprocess import IMAGE_TOKEN_INDEX

        agent = self.agent
        llama, projector, vision = agent.llama, agent.projector, agent.vision
        mm_layer = agent.cfg.mm_hidden_layer
        mode = self.mode
        lora_alpha, lora_rank = self.lora_alpha, self.lora_rank

        def splice_one(tok_emb, img_emb, ids, labels):
            """[T,D] text embeds + [P,D] image embeds -> [T+P-1,D] spliced
            at the (single) IMAGE_TOKEN_INDEX marker; labels follow, with
            the image span masked to IGNORE_INDEX."""
            t = ids.shape[0]
            p = img_emb.shape[0]
            is_marker = ids == IMAGE_TOKEN_INDEX
            has_img = jnp.any(is_marker)
            pos = jnp.argmax(is_marker)  # 0 when no marker (gated below)
            j = jnp.arange(t + p - 1)
            in_img = has_img & (j >= pos) & (j < pos + p)
            text_idx = jnp.where(has_img & (j >= pos + p), j - (p - 1), j)
            text_idx = jnp.clip(jnp.where(in_img, 0, text_idx), 0, t - 1)
            img_idx = jnp.clip(j - pos, 0, p - 1)
            emb = jnp.where(in_img[:, None], img_emb[img_idx], tok_emb[text_idx])
            pad_tail = (~has_img) & (j >= t)
            lab = jnp.where(in_img | pad_tail, IGNORE_INDEX, labels[text_idx])
            return emb, lab

        def loss_fn(trainable, frozen, batch):
            params = {**frozen, **trainable}
            from supir_tpu.captioner.vision import select_patch_features

            hidden = vision.apply({"params": params["vision"]}, batch["images"])
            feats = jax.lax.stop_gradient(select_patch_features(hidden, mm_layer))
            img_emb = projector.apply({"params": params["projector"]}, feats)
            llama_p = params["llama"]
            if mode == "lora":
                llama_p = merge_lora(llama_p, params["lora"], lora_alpha, lora_rank)
            ids = batch["input_ids"].astype(jnp.int32)
            safe_ids = jnp.maximum(ids, 0)
            tok_emb = llama.apply(
                {"params": llama_p}, safe_ids, method=llama.embed)
            embeds, labels = jax.vmap(splice_one)(
                tok_emb, img_emb, ids, batch["labels"].astype(jnp.int32))
            pos = jnp.broadcast_to(jnp.arange(embeds.shape[1]), embeds.shape[:2])
            logits, _ = llama.apply({"params": llama_p}, embeds, pos)
            return causal_lm_loss(logits, labels)

        def step_fn(state, batch):
            params = state["params"]
            trainable = self.trainable_of(params)
            frozen = {k: v for k, v in params.items() if k not in trainable}
            loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen, batch)
            updates, opt = self.tx.update(grads, state["opt"], trainable)
            trainable = optax.apply_updates(trainable, updates)
            return {
                "params": {**frozen, **trainable},
                "opt": opt,
                "step": state["step"] + 1,
            }, loss

        return jax.jit(step_fn, donate_argnums=(0,))

    def save_projector_only(self, state, path: str):
        """Selective mm-projector checkpoint (llava_trainer.py:150-169)."""
        from supir_tpu.utils.checkpoint import save_params

        save_params(path, {"projector": state["params"]["projector"]})

    def save_lora_only(self, state, path: str):
        """LoRA adapter checkpoint (the reference's get_peft_state_maybe_zero_3
        save path, train.py:109-131)."""
        from supir_tpu.utils.checkpoint import save_params

        save_params(path, {
            "lora": state["params"]["lora"],
            "projector": state["params"]["projector"],
        })
