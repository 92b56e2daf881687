"""Captioner agent — the `LLavaAgent` surface of the reference
(`llava/llava_agent.py:18-108`): gen_image_caption(images) -> captions,
built from the CLIP vision tower + mm projector + Llama decoder.

Differences from the reference, by design:
  - runs on the same TPU mesh as the restorer (TP over 'model') instead of
    a second GPU;
  - decode is a jitted lax.scan over a static-length KV cache (no dynamic
    shapes), greedy or temperature/top-p sampling;
  - weights come from the converter (`captioner/convert.py`); without
    weights the agent refuses to build (the CLI degrades to no-caption,
    exactly like the reference's --no_llava).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.captioner.llama import LlamaConfig, LlamaForCausalLM
from supir_tpu.captioner.vision import (
    CLIPVisionConfig,
    CLIPVisionTower,
    preprocess_images,
    select_patch_features,
)
from supir_tpu.models.layers import Dense

IMAGE_TOKEN_INDEX = -200
DEFAULT_QUESTION = "Describe this image and its style in a very detailed manner."

VICUNA_SYSTEM = (
    "A chat between a curious human and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the human's "
    "questions."
)


def vicuna_v1_prompt(question: str) -> str:
    """vicuna_v1 conversation with an <image> slot (llava/conversation.py)."""
    return f"{VICUNA_SYSTEM} USER: <image>\n{question} ASSISTANT:"


@dataclasses.dataclass(frozen=True)
class CaptionerConfig:
    vision: CLIPVisionConfig = CLIPVisionConfig()
    llama: LlamaConfig = LlamaConfig()
    projector_type: str = "mlp2x_gelu"
    mm_hidden_layer: int = -2
    max_new_tokens: int = 512
    cache_len: int = 1536

    @classmethod
    def tiny(cls) -> "CaptionerConfig":
        return cls(
            vision=CLIPVisionConfig().tiny(),
            llama=LlamaConfig().tiny(),
            max_new_tokens=8,
            cache_len=384,
        )


class MMProjector:
    """mlp2x_gelu projector (llava/model/multimodal_projector/builder.py)."""

    @staticmethod
    def module(out_dim: int, dtype=jnp.float32):
        import flax.linen as nn

        class _Proj(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = Dense(out_dim, dtype=dtype, name="fc1")(x)
                x = nn.gelu(x)
                return Dense(out_dim, dtype=dtype, name="fc2")(x)

        return _Proj()


class CaptionerAgent:
    def __init__(self, cfg: CaptionerConfig, params: dict, tokenizer=None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.vision = CLIPVisionTower(cfg.vision)
        self.llama = LlamaForCausalLM(cfg.llama)
        self.projector = MMProjector.module(cfg.llama.dim)

    # ------------------------------------------------------------ factory

    @classmethod
    def create_default(cls, weights_dir: Optional[str] = None):
        if weights_dir is None:
            raise RuntimeError(
                "no captioner weights configured; pass weights_dir with "
                "converted llava-v1.5 params or use create_random(tiny)"
            )
        raise NotImplementedError("weight loading lands with captioner/convert.py")

    @classmethod
    def create_random(cls, cfg: Optional[CaptionerConfig] = None, seed: int = 0):
        cfg = cfg or CaptionerConfig.tiny()
        rng = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(rng, 3)
        vision = CLIPVisionTower(cfg.vision)
        llama = LlamaForCausalLM(cfg.llama)
        proj = MMProjector.module(cfg.llama.dim)
        img = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
        vp = vision.init(k1, img)["params"]
        feats = jnp.zeros((1, cfg.vision.num_patches, cfg.vision.width))
        pp = proj.init(k2, feats)["params"]
        ids = jnp.zeros((1, 4), jnp.int32)
        pos = jnp.zeros((1, 4), jnp.int32)
        lp = llama.init(k3, ids, pos, method=llama.forward_ids)["params"]
        return cls(cfg, {"vision": vp, "projector": pp, "llama": lp})

    def shard(self, mesh):
        """Tensor/FSDP-shard the 13B decoder over the mesh 'model' axis —
        the TPU re-expression of the reference's second-GPU placement
        (test.py:10-17). GSPMD inserts the collectives."""
        import jax

        from supir_tpu.parallel.sharding import fsdp_param_shardings

        self.params = jax.device_put(
            self.params, fsdp_param_shardings(self.params, mesh)
        )
        return self

    # ------------------------------------------------------------ tokenize

    def _tokenize(self, text: str) -> List[int]:
        if self.tokenizer is not None:
            return self.tokenizer.encode(text)
        # byte fallback (tests): keeps ids < tiny vocab
        return [1] + [b % (self.cfg.llama.vocab_size - 4) + 2 for b in text.encode()][:200]

    def _detokenize(self, ids: List[int]) -> str:
        if self.tokenizer is not None:
            return self.tokenizer.decode(ids, skip_special_tokens=True)
        return "".join(chr((i - 2) % 94 + 32) for i in ids)

    # ------------------------------------------------------------ generate

    @functools.cached_property
    def _prefill_decode(self):
        llama = self.llama
        cfg = self.cfg

        def prefill(params, embeds, positions, caches):
            logits, caches = llama.apply(
                {"params": params["llama"]}, embeds, positions,
                caches=caches, cache_index=0,
            )
            return logits[:, -1], caches

        def decode_step(params, tok, pos, caches, rng, temperature, top_p):
            emb = llama.apply({"params": params["llama"]}, tok, method=llama.embed)
            logits, caches = llama.apply(
                {"params": params["llama"]}, emb, pos[:, None],
                caches=caches, cache_index=pos[0],
            )
            logits = logits[:, -1]

            def sample(rng):
                lg = logits / jnp.maximum(temperature, 1e-4)
                probs = jax.nn.softmax(lg, axis=-1)
                sort_idx = jnp.argsort(-probs, axis=-1)
                sorted_p = jnp.take_along_axis(probs, sort_idx, axis=-1)
                cum = jnp.cumsum(sorted_p, axis=-1)
                keep = cum - sorted_p < top_p
                filt = jnp.where(keep, sorted_p, 0.0)
                filt = filt / jnp.sum(filt, axis=-1, keepdims=True)
                choice = jax.random.categorical(rng, jnp.log(jnp.maximum(filt, 1e-20)))
                return jnp.take_along_axis(sort_idx, choice[:, None], axis=-1)[:, 0]

            next_tok = jax.lax.cond(
                temperature > 0.0,
                sample,
                lambda _: jnp.argmax(logits, axis=-1),
                rng,
            )
            return next_tok, caches

        return jax.jit(prefill), jax.jit(decode_step)

    def _encode_image(self, images_uint8) -> jnp.ndarray:
        pixels = preprocess_images(images_uint8, self.cfg.vision.image_size)
        hidden = self.vision.apply({"params": self.params["vision"]}, jnp.asarray(pixels))
        feats = select_patch_features(hidden, self.cfg.mm_hidden_layer)
        return self.projector.apply({"params": self.params["projector"]}, feats)

    def gen_image_caption(
        self,
        images,
        temperature: float = 0.2,
        top_p: float = 0.7,
        qs: Optional[str] = None,
        seed: int = 0,
        eos_id: int = 2,
    ) -> List[str]:
        """uint8 HWC images -> captions (llava_agent.py:65-103)."""
        cfg = self.cfg
        question = qs or DEFAULT_QUESTION
        prompt = vicuna_v1_prompt(question)
        pre, post = prompt.split("<image>")
        pre_ids = self._tokenize(pre)
        post_ids = self._tokenize(post)[1:] if self.tokenizer else self._tokenize(post)

        img_embeds = self._encode_image(images)  # [B, P, dim]
        b = img_embeds.shape[0]

        emb = lambda ids: self.llama.apply(
            {"params": self.params["llama"]},
            jnp.asarray(ids, jnp.int32)[None].repeat(b, 0),
            method=self.llama.embed,
        )
        embeds = jnp.concatenate([emb(pre_ids), img_embeds, emb(post_ids)], axis=1)
        plen = embeds.shape[1]
        assert plen + cfg.max_new_tokens <= cfg.cache_len, "cache too small"

        prefill, decode_step = self._prefill_decode
        caches = self.llama.init_cache(b, cfg.cache_len)
        positions = jnp.broadcast_to(jnp.arange(plen), (b, plen))
        logits, caches = prefill(self.params, embeds, positions, caches)

        rng = jax.random.PRNGKey(seed)
        tok = jnp.argmax(logits, axis=-1)
        outs = [np.asarray(tok)]
        done = np.zeros(b, bool)
        for i in range(cfg.max_new_tokens - 1):
            pos = jnp.full((b,), plen + i, jnp.int32)
            rng, sub = jax.random.split(rng)
            tok, caches = decode_step(
                self.params, tok[:, None], pos, caches, sub,
                jnp.float32(temperature), jnp.float32(top_p),
            )
            t_host = np.asarray(tok)
            outs.append(t_host)
            done |= t_host == eos_id
            if done.all():
                break

        captions = []
        seqs = np.stack(outs, axis=1)
        for row in seqs:
            ids = []
            for t in row:
                if t == eos_id:
                    break
                ids.append(int(t))
            captions.append(self._detokenize(ids).strip())
        return captions
