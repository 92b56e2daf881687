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
# autoregressive decode steps per device program (host syncs between
# chunks only; see CaptionerAgent._decode_tokens)
_DECODE_CHUNK = 16
DEFAULT_QUESTION = "Describe this image and its style in a very detailed manner."

def vicuna_v1_prompt(question: str) -> str:
    """vicuna_v1 conversation with an <image> slot (kept for back-compat;
    the registry in captioner/conversation.py is the general surface)."""
    from supir_tpu.captioner.conversation import build_prompt

    return build_prompt("vicuna_v1", question)


@dataclasses.dataclass(frozen=True)
class CaptionerConfig:
    vision: CLIPVisionConfig = CLIPVisionConfig()
    llama: LlamaConfig = LlamaConfig()
    projector_type: str = "mlp2x_gelu"
    mm_hidden_layer: int = -2
    max_new_tokens: int = 512
    cache_len: int = 1536
    # activation compute dtype ("float32" | "bfloat16") and KV-cache dtype
    # ("float32" | "bfloat16" | "int8"). The reference serves LLaVA in fp16
    # (builder.py:26-148 torch_dtype); bf16 is the TPU analogue — fp32
    # prefill dots run ~8x slower on the MXU and an fp32 cache doubles the
    # decode's dominant HBM stream (2.1 GB/token at cache_len 1280, 13B
    # dims). "int8" stores per-(position, head)-scaled int8 KV entries
    # (llama._quant_kv), halving the bf16 cache stream again.
    compute_dtype: str = "float32"
    kv_dtype: str = "float32"

    @classmethod
    def tiny(cls) -> "CaptionerConfig":
        return cls(
            vision=CLIPVisionConfig().tiny(),
            llama=LlamaConfig().tiny(),
            max_new_tokens=8,
            cache_len=384,
        )

    @classmethod
    def from_hf_config(cls, hf: dict) -> "CaptionerConfig":
        """Build from an HF llava config.json dict (7b/13b dims etc.,
        reference llava/model/builder.py:26-148 reads the same fields)."""
        llama = LlamaConfig(
            vocab_size=hf.get("vocab_size", 32000),
            dim=hf.get("hidden_size", 5120),
            layers=hf.get("num_hidden_layers", 40),
            heads=hf.get("num_attention_heads", 40),
            kv_heads=hf.get("num_key_value_heads", hf.get("num_attention_heads", 40)),
            hidden_dim=hf.get("intermediate_size", 13824),
            max_seq_len=hf.get("max_position_embeddings", 2048),
            rope_theta=hf.get("rope_theta", 10000.0),
            rms_eps=hf.get("rms_norm_eps", 1e-6),
        )
        vision = CLIPVisionConfig()
        if "vision_config" in hf:  # explicit dims (tiny/smoke checkpoints)
            v = hf["vision_config"]
            vision = CLIPVisionConfig(
                image_size=v.get("image_size", 336),
                patch_size=v.get("patch_size", 14),
                width=v.get("hidden_size", 1024),
                layers=v.get("num_hidden_layers", 24),
                heads=v.get("num_attention_heads", 16),
            )
        return cls(
            llama=llama,
            vision=vision,
            projector_type=hf.get("mm_projector_type", "mlp2x_gelu"),
            mm_hidden_layer=hf.get("mm_vision_select_layer", -2),
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
                # torch nn.GELU() is the EXACT erf gelu (flax defaults to the
                # tanh approximation — a real drift the torch golden caught)
                x = nn.gelu(x, approximate=False)
                return Dense(out_dim, dtype=dtype, name="fc2")(x)

        return _Proj()


class CaptionerAgent:
    def __init__(self, cfg: CaptionerConfig, params: dict, tokenizer=None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self._compute_dtype = dt
        self._kv_dtype = {
            "bfloat16": jnp.bfloat16, "int8": jnp.int8,
        }.get(cfg.kv_dtype, jnp.float32)
        self.vision = CLIPVisionTower(cfg.vision, dtype=dt)
        self.llama = LlamaForCausalLM(cfg.llama, dtype=dt)
        self.projector = MMProjector.module(cfg.llama.dim, dtype=dt)

    # ------------------------------------------------------------ factory

    @classmethod
    def create_default(
        cls,
        weights_dir: Optional[str] = None,
        cfg: Optional[CaptionerConfig] = None,
        param_dtype=None,
        mesh=None,
        load_8bit: bool = False,
        load_4bit: bool = False,
    ):
        """Build from real HF llava-v1.5 weights (reference
        llava/model/builder.py:26-148 + llava_agent.py:18-64).

        weights_dir: an HF llava checkpoint dir (config.json + *.safetensors
        /*.bin + tokenizer files). Defaults to $LLAVA_MODEL_PATH
        (CKPT_PTH.py surface). param_dtype defaults to bf16 on TPU (the 13B
        decoder is 26 GB fp32 — over a v5e chip).
        """
        import json
        import os

        import CKPT_PTH  # noqa: F401 — repo-root constants (reference surface)

        weights_dir = weights_dir or CKPT_PTH.LLAVA_MODEL_PATH
        if not weights_dir or not os.path.exists(weights_dir):
            raise RuntimeError(
                "no captioner weights: set LLAVA_MODEL_PATH to an HF "
                "llava-v1.5 checkpoint dir (or pass weights_dir); the CLI "
                "degrades to no-caption, like the reference's --no_llava"
            )
        if cfg is None:
            cfg_path = os.path.join(weights_dir, "config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    cfg = CaptionerConfig.from_hf_config(json.load(f))
            else:
                cfg = CaptionerConfig()

        from supir_tpu.captioner.convert import load_captioner_checkpoint

        params, report = load_captioner_checkpoint(weights_dir, cfg)
        if report.missing:
            raise RuntimeError(
                f"captioner checkpoint incomplete ({report.summary()}); "
                f"first missing: {report.missing[:5]}"
            )
        print("captioner conversion:", report.summary())

        if load_8bit or load_4bit:
            # --load_8bit_llava / --load_4bit_llava analogue (reference
            # builder.py:29-38): quantized block projections; everything
            # else follows param_dtype
            import dataclasses as dc

            from supir_tpu.captioner.llama import quantize_llama_params

            bits = 4 if load_4bit else 8
            params["llama"], saved = quantize_llama_params(
                params["llama"], bits=bits, fuse=True
            )
            cfg = dc.replace(cfg, llama=dc.replace(
                cfg.llama, quantize_int8=bits == 8, quantize_int4=bits == 4,
                fused_qkv=True,
            ))
            print(f"captioner int{bits}: saved {saved / 1e6:.1f} MB of weights")

        if param_dtype is None and jax.default_backend() == "tpu":
            param_dtype = jnp.bfloat16
        if param_dtype == jnp.bfloat16:
            # bf16 params => bf16 compute + KV cache (the reference serves
            # fp16 end to end; fp32 activations would un-fuse the win)
            import dataclasses as _dc

            cfg = _dc.replace(cfg, compute_dtype="bfloat16", kv_dtype="bfloat16")
        if param_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda v: jnp.asarray(v, param_dtype)
                if np.asarray(v).dtype == np.float32 else jnp.asarray(v),
                params,
            )

        tokenizer = cls.load_tokenizer(weights_dir)
        agent = cls(cfg, params, tokenizer=tokenizer)
        if mesh is not None:
            agent.shard(mesh)
        return agent

    @staticmethod
    def load_tokenizer(path: str):
        """HF tokenizer from the checkpoint dir; a real llava-v1.5 dir always
        carries tokenizer files. Falls back to the byte tokenizer (with a
        warning) so synthetic/smoke checkpoints still generate."""
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(path, local_files_only=True)
        except Exception as e:
            print(f"[warn] tokenizer load failed from {path!r} ({e}); "
                  "using byte fallback")
            return None

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

    def _decode_tokens_iter(
        self, first_tok, plen: int, caches, seed: int,
        temperature: float, top_p: float, eos_id: int, stopper=None,
    ):
        """Chunked autoregressive decode, yielding after every device
        program: ([B, n] tokens-so-far, stop_at[B]) — the streaming unit the
        serving plane forwards (reference model_worker.py:123-193 yields
        partial generations the same way).

        Runs `_DECODE_CHUNK` steps per device program and checks EOS plus
        keyword stop strings (KeywordStopper — the reference's
        KeywordsStoppingCriteria, mm_utils.py:76-101) on the host between
        chunks: per-token host syncs cost ~0.5 s each through a tunneled
        device. Greedy decode is token-identical to the step-at-a-time
        loop; chunk tokens past EOS/stop/max_new are dropped. stop_at[b]
        is the per-row cut index from keyword matches (n if none)."""
        cfg = self.cfg
        _, _, decode_chunk = self._prefill_decode
        rng = jax.random.PRNGKey(seed)
        b = first_tok.shape[0]
        first_host = np.asarray(first_tok)
        outs = [first_host]
        done = first_host == eos_id
        stop_at = np.full((b,), np.iinfo(np.int64).max, np.int64)

        def check_keywords(prev_n: int):
            nonlocal done
            if stopper is None or not stopper.keywords:
                return
            arr = np.stack(outs, axis=1)  # [B, n]
            for bi in range(b):
                if done[bi]:
                    continue
                cut = stopper.find_stop(arr[bi].tolist(), start=prev_n)
                if cut is not None:
                    stop_at[bi] = min(stop_at[bi], cut)
                    done[bi] = True

        check_keywords(0)
        tok = first_tok
        n = 1
        yield np.stack(outs, axis=1), np.minimum(stop_at, n)

        # Depth-1 dispatch-ahead: the next chunk depends only on DEVICE
        # values (last token + caches), so it is enqueued before the
        # previous chunk's host readback — the ~33 ms tunnel round trip and
        # the host-side EOS/keyword scan overlap chunk i+1's compute
        # instead of idling the chip. Token-identical to the serial loop
        # (same rng split order); on an early stop at most one speculative
        # chunk is discarded.
        n_disp = 1  # tokens covered by dispatched chunks (incl. first)
        pending = []

        def dispatch():
            nonlocal tok, n_disp, rng, caches
            pos0 = jnp.full((b,), plen + n_disp - 1, jnp.int32)
            rng, sub = jax.random.split(rng)
            toks, caches = decode_chunk(
                self.params, tok, pos0, caches, sub,
                jnp.float32(temperature), jnp.float32(top_p),
            )
            tok = toks[-1]
            pending.append(toks)
            n_disp += toks.shape[0]

        if n < cfg.max_new_tokens and not done.all():
            dispatch()
        while pending:
            if (n_disp < cfg.max_new_tokens and not done.all()
                    and len(pending) < 2):
                dispatch()
            toks = pending.pop(0)
            prev_n = n
            for row in np.asarray(toks):  # [chunk, B]
                if n >= cfg.max_new_tokens:
                    break
                outs.append(row)
                done = done | (row == eos_id)
                n += 1
                if done.all():
                    break
            check_keywords(prev_n)
            yield np.stack(outs, axis=1), np.minimum(stop_at, n)
            if done.all() or n >= cfg.max_new_tokens:
                break

    def _decode_tokens(
        self, first_tok, plen: int, caches, seed: int,
        temperature: float, top_p: float, eos_id: int, stopper=None,
    ):
        """Chunked decode, fully drained -> ([B, n] tokens, stop_at[B])."""
        for seqs, stop_at in self._decode_tokens_iter(
            first_tok, plen, caches, seed, temperature, top_p, eos_id, stopper
        ):
            pass
        return seqs, stop_at

    def _finalize_row(self, row, stop_at: int, eos_id: int,
                      stop_str: Optional[str]) -> str:
        """Token row -> text: cut at EOS/keyword-token match, then trim any
        decoded stop-string remnant (reference strips stop_str from the
        decoded output, llava_agent.py:96-100; ours cuts at the FIRST
        occurrence because chunked decode can overshoot mid-chunk)."""
        ids = []
        for j, t in enumerate(row):
            if j >= stop_at or t == eos_id:
                break
            ids.append(int(t))
        text = self._detokenize(ids).strip()
        if stop_str:
            i = text.find(stop_str)
            if i >= 0:
                text = text[:i]
        return text.strip()

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
            if cfg.llama.fused_pairs:
                from supir_tpu.captioner.llama import fused_pair_decode_step

                logits, caches = fused_pair_decode_step(
                    cfg.llama, params["llama"], emb, pos[:, None], caches,
                    pos[0], compute_dtype=self._compute_dtype,
                )
            else:
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

        def decode_chunk(params, tok, pos0, caches, rng, temperature, top_p):
            """`_DECODE_CHUNK` steps in ONE device program (lax.scan).

            Per-token host round-trips dominate autoregressive decode on a
            remote/tunneled device (measured 533 ms/token vs ~30 ms compute
            at 13B-int4); chunking cuts syncs 16x. The KV caches are
            donated so the ~1 GB cache tree updates in place."""

            def body(carry, i):
                tok, caches, rng = carry
                rng, sub = jax.random.split(rng)
                ntok, caches = decode_step(
                    params, tok[:, None], pos0 + i, caches, sub,
                    temperature, top_p,
                )
                return (ntok, caches, rng), ntok

            (tok, caches, rng), toks = jax.lax.scan(
                body, (tok, caches, rng), jnp.arange(_DECODE_CHUNK)
            )
            return toks, caches  # toks: [chunk, B]

        return (
            jax.jit(prefill, donate_argnums=(3,)),
            jax.jit(decode_step),
            jax.jit(decode_chunk, donate_argnums=(3,)),
        )

    @functools.cached_property
    def _encode_jit(self):
        """Vision tower + projector as ONE jitted program: eager flax apply
        dispatches each op separately, which costs seconds through a
        tunneled device (measured 3.9 s vs <0.1 s jitted for CLIP-L/336)."""

        def run(params, pixels):
            hidden = self.vision.apply({"params": params["vision"]}, pixels)
            feats = select_patch_features(hidden, self.cfg.mm_hidden_layer)
            return self.projector.apply({"params": params["projector"]}, feats)

        return jax.jit(run)

    @functools.cached_property
    def _embed_jit(self):
        return jax.jit(
            lambda params, ids: self.llama.apply(
                {"params": params["llama"]}, ids, method=self.llama.embed
            )
        )

    def _encode_image(self, images_uint8) -> jnp.ndarray:
        pixels = preprocess_images(images_uint8, self.cfg.vision.image_size)
        return self._encode_jit(self.params, jnp.asarray(pixels))

    def _prefill_images(self, images, qs: Optional[str], conv_mode: str):
        """Prompt build + image splice + prefill -> decode-ready state."""
        from supir_tpu.captioner.conversation import build_prompt

        cfg = self.cfg
        stopper, stop_str = self._make_stopper(conv_mode)
        question = qs or DEFAULT_QUESTION
        prompt = build_prompt(conv_mode, question)
        pre, post = prompt.split("<image>")
        pre_ids = self._tokenize(pre)
        post_ids = self._tokenize(post)[1:] if self.tokenizer else self._tokenize(post)

        img_embeds = self._encode_image(images)  # [B, P, dim]
        b = img_embeds.shape[0]

        emb = lambda ids: self._embed_jit(
            self.params, jnp.asarray(ids, jnp.int32)[None].repeat(b, 0)
        )
        embeds = jnp.concatenate([emb(pre_ids), img_embeds, emb(post_ids)], axis=1)
        plen = embeds.shape[1]
        # a longer-than-budgeted prompt would otherwise overflow the static
        # cache silently (dynamic_update_slice clamps at the boundary,
        # corrupting the last positions)
        assert plen + cfg.max_new_tokens <= cfg.cache_len, (
            f"KV cache too small: prefill {plen} + max_new_tokens "
            f"{cfg.max_new_tokens} > cache_len {cfg.cache_len}"
        )

        prefill, _, _ = self._prefill_decode
        caches = self.llama.init_cache(b, cfg.cache_len, dtype=self._kv_dtype)
        positions = jnp.broadcast_to(jnp.arange(plen), (b, plen))
        logits, caches = prefill(self.params, embeds, positions, caches)
        tok = jnp.argmax(logits, axis=-1)
        return tok, plen, caches, stopper, stop_str

    def _texts_from(self, seqs, stop_at, eos_id, stop_str) -> List[str]:
        # reference output cleanup (llava_agent.py:96-101): strip stop_str,
        # flatten newlines into spaces
        return [
            self._finalize_row(row, stop_at[bi], eos_id, stop_str)
            .replace("\n", " ").replace("\r", " ")
            for bi, row in enumerate(seqs)
        ]

    def gen_image_caption(
        self,
        images,
        temperature: float = 0.2,
        top_p: float = 0.7,
        qs: Optional[str] = None,
        seed: int = 0,
        eos_id: int = 2,
        conv_mode: str = "vicuna_v1",
    ) -> List[str]:
        """uint8 HWC images -> captions (llava_agent.py:65-103)."""
        tok, plen, caches, stopper, stop_str = self._prefill_images(
            images, qs, conv_mode
        )
        seqs, stop_at = self._decode_tokens(
            tok, plen, caches, seed, temperature, top_p, eos_id, stopper
        )
        return self._texts_from(seqs, stop_at, eos_id, stop_str)

    def gen_image_caption_stream(
        self,
        images,
        temperature: float = 0.2,
        top_p: float = 0.7,
        qs: Optional[str] = None,
        seed: int = 0,
        eos_id: int = 2,
        conv_mode: str = "vicuna_v1",
    ):
        """Streaming gen_image_caption: yields the partial caption list
        after every decode chunk (`_DECODE_CHUNK` tokens per device
        program) — the token stream the serving plane frames out to
        clients (reference ModelWorker.generate_stream yields partial
        generations the same way, model_worker.py:123-193)."""
        tok, plen, caches, stopper, stop_str = self._prefill_images(
            images, qs, conv_mode
        )
        for seqs, stop_at in self._decode_tokens_iter(
            tok, plen, caches, seed, temperature, top_p, eos_id, stopper
        ):
            yield self._texts_from(seqs, stop_at, eos_id, stop_str)

    def _make_stopper(self, conv_mode: str):
        """(KeywordStopper, stop_str) for a template — run_llava.py:63-65."""
        from supir_tpu.captioner.conversation import (
            KeywordStopper, conv_templates,
        )

        stop_str = conv_templates[conv_mode].stop_str
        if not stop_str:
            return None, None
        bos = getattr(self.tokenizer, "bos_token_id", None) if self.tokenizer else None
        return KeywordStopper(
            [stop_str], self._tokenize, self._detokenize, bos_id=bos
        ), stop_str

    def chat(
        self,
        text: str,
        temperature: float = 0.2,
        top_p: float = 0.7,
        seed: int = 0,
        eos_id: int = 2,
        conv_mode: str = "vicuna_v1",
    ) -> str:
        """Text-only turn (no image splice) — the reference CLI's non-image
        path (llava/serve/cli.py) and the LLM-judge surface for pairwise
        review."""
        from supir_tpu.captioner.conversation import build_prompt

        cfg = self.cfg
        stopper, stop_str = self._make_stopper(conv_mode)
        prompt = build_prompt(conv_mode, text, with_image=False)
        ids = self._tokenize(prompt)
        ids = ids[: cfg.cache_len - cfg.max_new_tokens]
        embeds = self._embed_jit(self.params, jnp.asarray(ids, jnp.int32)[None])
        plen = embeds.shape[1]
        prefill, _, _ = self._prefill_decode
        caches = self.llama.init_cache(1, cfg.cache_len, dtype=self._kv_dtype)
        positions = jnp.broadcast_to(jnp.arange(plen), (1, plen))
        logits, caches = prefill(self.params, embeds, positions, caches)
        tok = jnp.argmax(logits, axis=-1)
        seqs, stop_at = self._decode_tokens(
            tok, plen, caches, seed, temperature, top_p, eos_id, stopper
        )
        return self._finalize_row(seqs[0], stop_at[0], eos_id, stop_str)
