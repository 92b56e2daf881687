"""SUPIREngine — the orchestration layer.

Behavioral contract: `SUPIR/models/SUPIR_model.py` (SUPIRModel) +
`sgm/models/diffusion.py` (DiffusionEngine): stage-1 denoise-encoding,
conditioning assembly, the CFG-batched control denoiser, sampling, decoding
and color fix.

TPU-first redesign:
  - The reference re-instantiates its sampler from mutated OmegaConf on
    every call (SUPIR_model.py:101-111). Here sampler settings are data:
    per-step scalar tables (StepTables) passed as *dynamic* jit arguments,
    so changing cfg/control/restore scales never recompiles.
  - Every stage is a cached `jax.jit` closure keyed by (shape, num_steps,
    sampler); the 50-step hot loop is a single `lax.scan`.
  - Images/latents are NHWC; dtype policy: bf16 compute / fp32 params,
    fp32 sampler state.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.config import SUPIRConfig, dtype_of
from supir_tpu.diffusion.denoiser import DiscreteDenoiser
from supir_tpu.diffusion.discretization import legacy_ddpm_sigmas
from supir_tpu.diffusion.guidance import cfg_combine
from supir_tpu.diffusion import samplers as S
from supir_tpu.models.control import GLVControl, LightGLVUNet
from supir_tpu.models.embedders import Conditioner, ConditionerConfig
from supir_tpu.models.vae import AutoencoderKL, DiagonalGaussian
from supir_tpu.utils.colorfix import (
    adaptive_instance_normalization,
    wavelet_reconstruction,
)

def _per_instance_cache(maxsize: int = 8):
    """lru_cache for methods that dies WITH the instance.

    `functools.lru_cache` applied directly to a method keys on `self` in a
    class-level cache, pinning every engine ever built (and its ~GBs of
    compiled closures) for the life of the process — the web demo's Q/F
    hot-swap and bench --e2e's engine->captioner chip swap both leak HBM
    that way. This variant stores the lru_cache in the instance __dict__,
    so dropping the engine frees everything (the closure->self cycle is
    ordinary gc fodder)."""

    def deco(fn):
        attr = f"__memo_{fn.__name__}"

        @functools.wraps(fn)
        def wrapper(self, *args, **kwargs):
            memo = self.__dict__.get(attr)
            if memo is None:
                memo = functools.lru_cache(maxsize=maxsize)(
                    lambda *a, **k: fn(self, *a, **k)
                )
                self.__dict__[attr] = memo
            return memo(*args, **kwargs)

        return wrapper

    return deco


SAMPLERS = {
    "RestoreEDM": S.restore_edm_sample,
    "EulerEDM": S.euler_edm_sample,
    "HeunEDM": S.heun_edm_sample,
    "EulerAncestral": S.euler_ancestral_sample,
    "DPMPP2SAncestral": S.dpmpp2s_ancestral_sample,
    "DPMPP2M": S.dpmpp2m_sample,
    "RestoreDPMPP2M": S.dpmpp2m_sample,  # eta=1 SDE variant via kwargs
    "LMS": S.lms_sample,
}


class SUPIREngine:
    """Holds module definitions + parameter pytree; exposes the reference's
    public engine surface (`batchify_denoise`, `batchify_sample`,
    `prepare_condition`, `encode/decode_first_stage`)."""

    def __init__(
        self,
        cfg: SUPIRConfig,
        params: Dict[str, Any],
        cond_cfg: Optional[ConditionerConfig] = None,
    ):
        self.cfg = cfg
        self.params = params
        ae_dtype = dtype_of(cfg.ae_dtype)
        diff_dtype = dtype_of(cfg.diffusion_dtype)
        self.vae = AutoencoderKL(cfg.vae, dtype=ae_dtype)
        self.control_net = GLVControl(
            cfg.unet, input_upscale=cfg.control.input_upscale, dtype=diff_dtype
        )
        self.unet = LightGLVUNet(cfg.unet, cfg.control, dtype=diff_dtype)
        self.cond_cfg = cond_cfg
        self.conditioner = Conditioner(cond_cfg, dtype=ae_dtype) if cond_cfg else None
        self.denoiser = DiscreteDenoiser(num_idx=cfg.num_idx)

    # ----------------------------------------------------------------- VAE

    @functools.cached_property
    def _encode_denoise_jit(self):
        def f(params, x):
            moments = self.vae.apply(
                {"params": params["vae"]}, x, True, method=self.vae.moments
            )
            z = DiagonalGaussian(moments).mode()
            return (z * self.cfg.scale_factor).astype(jnp.float32)

        return jax.jit(f)

    @functools.cached_property
    def _encode_jit(self):
        def f(params, x):
            moments = self.vae.apply(
                {"params": params["vae"]}, x, False, method=self.vae.moments
            )
            z = DiagonalGaussian(moments).mode()
            return (z * self.cfg.scale_factor).astype(jnp.float32)

        return jax.jit(f)

    @functools.cached_property
    def _encode_sample_jit(self):
        def f(params, x, noise):
            moments = self.vae.apply(
                {"params": params["vae"]}, x, False, method=self.vae.moments
            )
            p = DiagonalGaussian(moments)
            z = p.mean + p.std * noise.astype(p.mean.dtype)
            return (z * self.cfg.scale_factor).astype(jnp.float32)

        return jax.jit(f)

    @functools.cached_property
    def _decode_jit(self):
        def f(params, z):
            out = self.vae.apply(
                {"params": params["vae"]},
                z / self.cfg.scale_factor,
                method=self.vae.decode,
            )
            return out.astype(jnp.float32)

        return jax.jit(f)

    # tiled-VAE mode (reference init_tile_vae, SUPIR_model.py:138-151)
    _tile_vae = None

    def init_tile_vae(self, encoder_tile_size: int = 512, decoder_tile_size: int = 64,
                      chunk: Optional[Tuple[int, int]] = (8, 4),
                      fast_mode: bool = False):
        """Switch first-stage encode/decode to the tiled (sharded) path.
        encoder_tile_size in image px, decoder_tile_size in latent px.
        `chunk` = (encode, decode) tiles per call on the single-chip path
        (ignored under a tile mesh); None folds all tiles at once.

        GN statistics on the chunked path default to EXACT global pooling
        (staged-exact executor — the reference's default contract,
        tilevae.py:599-648); `fast_mode=True` opts into chunk-local
        statistics (the reference's fast mode, :855-876), ~1.4x faster."""
        self._tile_vae = (encoder_tile_size, decoder_tile_size, chunk, fast_mode)

    @_per_instance_cache(maxsize=8)
    def _tiled_vae_fns(self, enc_tile: int, dec_tile: int, chunk=None,
                       fast_mode=False, *, mesh_key=None):
        from supir_tpu.parallel.tiled_vae import tiled_decode, tiled_encode

        mesh = self._tiled_mesh
        cfg = self.cfg
        # chunking is the single-chip HBM bound; under a tile mesh the
        # shard_map path manages its own per-device tile count
        enc_chunk, dec_chunk = chunk if (chunk and mesh is None) else (None, None)

        def _moments(params, x, use_denoise):
            enc_params = params["vae"]["denoise_encoder" if use_denoise else "encoder"]
            return tiled_encode(
                cfg.vae, enc_params, params["vae"]["quant_conv"], x,
                tile_size=enc_tile, pad=32, mesh=mesh, chunk=enc_chunk,
                fast_mode=fast_mode,
            )

        def enc(params, x, use_denoise):
            z = DiagonalGaussian(_moments(params, x, use_denoise)).mode()
            return (z * cfg.scale_factor).astype(jnp.float32)

        def enc_sample(params, x, noise):
            # sampled posterior under tiling: the reference samples even in
            # tiled mode (VAEHook only wraps encoder.forward; posterior
            # .sample() still runs, autoencoder.py:319-321)
            p = DiagonalGaussian(_moments(params, x, use_denoise=False))
            z = p.mean + p.std * noise.astype(p.mean.dtype)
            return (z * cfg.scale_factor).astype(jnp.float32)

        def dec(params, z):
            out = tiled_decode(
                cfg.vae, params["vae"]["decoder"], params["vae"]["post_quant_conv"],
                z / cfg.scale_factor, tile_size=dec_tile, pad=8, mesh=mesh,
                chunk=dec_chunk, fast_mode=fast_mode,
            )
            return out.astype(jnp.float32)

        return (
            jax.jit(functools.partial(enc, use_denoise=True)),
            jax.jit(functools.partial(enc, use_denoise=False)),
            jax.jit(enc_sample),
            jax.jit(dec),
        )

    def _mesh_key(self):
        """Cache key component for the current tiled mesh. Keying the jit
        caches on this (rather than relying on call time) means a mesh set via
        `set_tiled_mesh`/`shard_for_inference` *after* the first tiled call is
        picked up instead of silently ignored."""
        return id(self._tiled_mesh) if self._tiled_mesh is not None else None

    def encode_first_stage_with_denoise(self, x):
        """LQ image [B,H,W,3] in [-1,1] -> stage-1 cleaned latent (mode)."""
        if self._tile_vae:
            f, _, _, _ = self._tiled_vae_fns(*self._tile_vae, mesh_key=self._mesh_key())
            return f(self.params, x)
        return self._encode_denoise_jit(self.params, x)

    def encode_first_stage(self, x, noise=None, rng=None):
        """HQ image -> latent. The reference's first stage is
        `AutoencoderKLInferenceWrapper.encode`, which SAMPLES the posterior
        (autoencoder.py:319-321) — so the x_center restoration-guidance
        target is a sampled latent, not the mode. Pass `rng` (or an explicit
        unit-normal `noise` of latent shape, for parity harnesses) to match;
        with neither, returns the deterministic mode — in tiled mode too."""
        if rng is not None and noise is None:
            fdown = self.cfg.vae.downscale_factor
            # the posterior mean has embed_dim channels (quant_conv emits
            # 2*embed_dim moments) — z_channels only coincides in SD configs
            noise = jax.random.normal(
                rng,
                (x.shape[0], x.shape[1] // fdown, x.shape[2] // fdown,
                 self.cfg.vae.embed_dim),
                jnp.float32,
            )
        if self._tile_vae:
            _, f, f_sample, _ = self._tiled_vae_fns(
                *self._tile_vae, mesh_key=self._mesh_key()
            )
            if noise is not None:
                return f_sample(self.params, x, noise)
            return f(self.params, x)
        if noise is not None:
            return self._encode_sample_jit(self.params, x, noise)
        return self._encode_jit(self.params, x)

    def decode_first_stage(self, z):
        if self._tile_vae:
            _, _, _, f = self._tiled_vae_fns(*self._tile_vae, mesh_key=self._mesh_key())
            return f(self.params, z)
        return self._decode_jit(self.params, z)

    def batchify_denoise(self, x):
        """Stage-1: degradation-robust encode then decode (SUPIR_model.py:72)."""
        return self.decode_first_stage(self.encode_first_stage_with_denoise(x))

    @staticmethod
    def _check_override(name: str, arr, expected_shape):
        """Validate a noise-override's shape up front: a mismatch would
        otherwise fail deep inside jit with an opaque broadcast error."""
        if arr is None:
            return
        got = tuple(np.asarray(arr).shape)
        if got != tuple(expected_shape):
            raise ValueError(
                f"{name} shape {got} != expected latent shape {tuple(expected_shape)}"
            )

    # ---------------------------------------------------------- conditioning

    def prepare_condition(
        self,
        z: jnp.ndarray,
        tokens_l: jnp.ndarray,
        tokens_bigg: jnp.ndarray,
        tokens_l_uc: jnp.ndarray,
        tokens_bigg_uc: jnp.ndarray,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """SDXL conditioning batch: fixed 1024 size/crop tuples + text
        (SUPIR_model.py:152-179)."""
        n = z.shape[0]
        size = jnp.full((n, 2), 1024.0)
        crop = jnp.zeros((n, 2))

        def run(tl, tg):
            out = self.conditioner.apply(
                {"params": self.params["conditioner"]}, tl, tg, size, crop, size
            )
            return {k: v.astype(jnp.float32) for k, v in out.items()}

        c = run(tokens_l, tokens_bigg)
        uc = run(tokens_l_uc, tokens_bigg_uc)
        c["control"] = z
        uc["control"] = z
        return c, uc

    _cond_cache: Dict[Any, Any] = None

    def prepare_condition_cached(self, z, tokens_l, tokens_bigg, tokens_l_uc, tokens_bigg_uc):
        """PreparedConditioner behavior (reference encoders/modules.py:246):
        text-tower outputs for repeated prompts (the fixed positive/negative
        prompt suffixes) are computed once and reused; only the control
        latent changes per call."""
        import hashlib

        if self._cond_cache is None:
            self._cond_cache = {}
        key = hashlib.sha1(
            b"".join(np.asarray(t).tobytes() for t in
                     (tokens_l, tokens_bigg, tokens_l_uc, tokens_bigg_uc))
        ).hexdigest()
        if key not in self._cond_cache:
            c, uc = self.prepare_condition(z, tokens_l, tokens_bigg, tokens_l_uc, tokens_bigg_uc)
            self._cond_cache[key] = (
                {k: v for k, v in c.items() if k != "control"},
                {k: v for k, v in uc.items() if k != "control"},
            )
            if len(self._cond_cache) > 32:
                self._cond_cache.pop(next(iter(self._cond_cache)))
        c_txt, uc_txt = self._cond_cache[key]
        return dict(c_txt, control=z), dict(uc_txt, control=z)

    def prepare_condition_tiled(
        self,
        z: jnp.ndarray,
        tokens_l_tiles: jnp.ndarray,
        tokens_bigg_tiles: jnp.ndarray,
        tokens_l_uc: jnp.ndarray,
        tokens_bigg_uc: jnp.ndarray,
    ):
        """Per-tile local prompts for tiled sampling (reference
        SUPIR_model.py:167-178 + gradio_demo_tiled.py): tokens_*_tiles are
        [T, 77]; the uncond is shared. Returns (c, uc) where c carries
        'crossattn_tiles' [T, 1, 77, D] consumed by batchify_sample_tiled.
        Supports batch size 1, like the reference."""
        assert z.shape[0] == 1, "local prompts support batch=1 (reference parity)"
        t = tokens_l_tiles.shape[0]
        c, uc = self.prepare_condition(
            z, tokens_l_tiles[:1], tokens_bigg_tiles[:1], tokens_l_uc, tokens_bigg_uc
        )
        size = jnp.full((t, 2), 1024.0)
        crop = jnp.zeros((t, 2))
        out = self.conditioner.apply(
            {"params": self.params["conditioner"]},
            tokens_l_tiles, tokens_bigg_tiles, size, crop, size,
        )
        c["crossattn_tiles"] = out["crossattn"].astype(jnp.float32)[:, None]
        return c, uc

    def log_images(self, x, c, uc, num_steps: int = 8, seed: int = 0):
        """Debug/visualization dict (reference DiffusionEngine.log_images,
        diffusion.py:272-320): inputs, stage-1 reconstruction, and a short
        sample — everything a training loop would want to write out."""
        z = self.encode_first_stage_with_denoise(x)
        out = {
            "inputs": x,
            "stage1": self.decode_first_stage(z),
            "samples": self.batchify_sample(
                x, c, uc, num_steps=num_steps, seed=seed, z_override=z
            ),
        }
        return out

    def shard_for_inference(self, mesh):
        """Multi-chip inference: FSDP/TP-shard params over the mesh 'model'
        axis and let GSPMD insert the collectives. The reference's
        equivalent 'parallelism' was pinning SUPIR and LLaVA to two
        separate GPUs (test.py:10-17)."""
        from supir_tpu.parallel.sharding import fsdp_param_shardings

        self.params = jax.device_put(
            self.params, fsdp_param_shardings(self.params, mesh)
        )
        self.set_tiled_mesh(mesh if "tile" in mesh.shape else None)
        return self

    # -------------------------------------------------------------- sampling

    def _network(self, params, x, t, cond, control_scale):
        control = self.control_net.apply(
            {"params": params["control"]},
            cond["control"],
            t,
            x,
            cond["crossattn"],
            cond["vector"],
        )
        return self.unet.apply(
            {"params": params["unet"]},
            x,
            t,
            cond["crossattn"],
            cond["vector"],
            control,
            control_scale,
        )

    def _network_cached(self, params, x, t, cond, control_scale, cache, recompute):
        """Cross-step feature caching (opt-in approximation, no reference
        analogue): on recompute steps run the control branch + UNet
        encoder/middle and capture (control pyramid, encoder features);
        on reuse steps only the decoder + adapters + time embedding run
        against the cached features (DeepCache / encoder-propagation —
        PAPERS.md items 2/3; adjacent-sigma encoder features drift slowly).
        Exactness contract: recompute all-True is bit-identical to
        `_network` (tested)."""

        def full(cache):
            control = self.control_net.apply(
                {"params": params["control"]},
                cond["control"], t, x, cond["crossattn"], cond["vector"],
            )
            out, feats = self.unet.apply(
                {"params": params["unet"]},
                x, t, cond["crossattn"], cond["vector"], control,
                control_scale, return_features=True,
            )
            return out, (tuple(control), feats)

        def reuse(cache):
            control, feats = cache
            out = self.unet.apply(
                {"params": params["unet"]},
                x, t, cond["crossattn"], cond["vector"], list(control),
                control_scale, feature_cache=feats,
            )
            return out, cache

        return jax.lax.cond(recompute, full, reuse, cache)

    def _feature_cache_zeros(self, params, cond2, x_shape):
        """Zeros pytree matching the cached (control pyramid, encoder
        features) structure for a CFG-doubled batch of `x_shape`."""
        b2 = 2 * x_shape[0]
        xa = jax.ShapeDtypeStruct((b2,) + tuple(x_shape[1:]), jnp.float32)
        ta = jax.ShapeDtypeStruct((b2,), jnp.float32)

        def full_feats(xx, tt):
            control = self.control_net.apply(
                {"params": params["control"]},
                cond2["control"], tt, xx, cond2["crossattn"], cond2["vector"],
            )
            _, feats = self.unet.apply(
                {"params": params["unet"]},
                xx, tt, cond2["crossattn"], cond2["vector"], control, 1.0,
                return_features=True,
            )
            return (tuple(control), feats)

        sh = jax.eval_shape(full_feats, xa, ta)
        return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), sh)

    _seq_mesh = None
    _seq_axis = "seq"

    def set_sequence_mesh(self, mesh, axis: str = "seq"):
        """Long-context mode (SURVEY.md section 5): shard the attention
        SEQUENCE over `axis` of `mesh`. While a sampler traces, eligible
        self-attention sites (no bias, non-causal, S >= SUPIR_RING_MIN_SEQ)
        route through parallel/ring_attention — k/v rotate via ppermute so
        one tile's tokens never need to fit a single chip. None disables."""
        self._seq_mesh = mesh
        self._seq_axis = axis
        return self

    def _seq_ctx(self):
        import contextlib

        from supir_tpu.ops.attention import sequence_sharding

        if self._seq_mesh is None:
            return contextlib.nullcontext()
        return sequence_sharding(self._seq_mesh, self._seq_axis)

    @_per_instance_cache(maxsize=16)
    def _sample_fn(self, sampler_name: str, num_steps: int, eta: float, s_noise: float,
                   seq_mesh_key=None, cache_interval: int = 0):
        sample = SAMPLERS[sampler_name]
        kwargs = {}
        if sampler_name in ("RestoreDPMPP2M",):
            kwargs = dict(eta=eta, s_noise=s_noise)
        elif sampler_name in ("EulerAncestral", "DPMPP2SAncestral"):
            kwargs = dict(eta=eta, s_noise=s_noise)
        elif sampler_name in ("HeunEDM", "EulerEDM"):
            kwargs = dict(s_noise=s_noise)
        elif sampler_name == "RestoreEDM":
            kwargs = dict(s_noise=s_noise)

        def f(params, noised_z, c, uc, x_center, tables, rng):
            with self._seq_ctx():
                cond2 = {
                    k: jnp.concatenate([uc[k], c[k]], axis=0)
                    for k in ("crossattn", "vector", "control")
                }

                def denoise(x, sigma_b, cfg_b, ctrl_s):
                    x2 = jnp.concatenate([x, x], axis=0)
                    s2 = jnp.concatenate([sigma_b, sigma_b], axis=0)
                    den = self.denoiser(
                        functools.partial(self._network, params), x2, s2, cond2, ctrl_s
                    )
                    d_uc, d_c = jnp.split(den, 2, axis=0)
                    return cfg_combine(d_uc, d_c, cfg_b)

                if cache_interval >= 1 and sampler_name == "RestoreEDM":
                    # interval 1 = recompute every step (bit-identical to
                    # the plain path; used to pin the wiring), N>1 = reuse
                    # encoder/control features on N-1 of every N steps
                    def denoise_cached(x, sigma_b, cfg_b, ctrl_s, cache, rec):
                        x2 = jnp.concatenate([x, x], axis=0)
                        s2 = jnp.concatenate([sigma_b, sigma_b], axis=0)
                        den, cache = self.denoiser.call_cached(
                            functools.partial(self._network_cached, params),
                            x2, s2, cond2, ctrl_s, cache, rec,
                        )
                        d_uc, d_c = jnp.split(den, 2, axis=0)
                        return cfg_combine(d_uc, d_c, cfg_b), cache

                    cache0 = self._feature_cache_zeros(
                        params, cond2, noised_z.shape
                    )
                    rec = jnp.asarray(
                        np.arange(num_steps) % cache_interval == 0
                    )
                    from supir_tpu.diffusion.samplers import (
                        restore_edm_sample_cached,
                    )

                    return restore_edm_sample_cached(
                        denoise_cached, cache0, rec, noised_z, rng, tables,
                        x_center=x_center, **kwargs,
                    )
                if sampler_name == "RestoreEDM":
                    return sample(denoise, noised_z, rng, tables,
                                  x_center=x_center, **kwargs)
                return sample(denoise, noised_z, rng, tables, **kwargs)

        # donate the fresh noise buffer: the scan carry reuses it in place
        return jax.jit(f, donate_argnums=(1,))

    def _tiled_feature_cache_zeros(self, params, c, b: int, zc: int,
                                   tile_size: int, n_tiles: int,
                                   mesh, tile_chunk: Optional[int]):
        """cache0 for the tiled feature cache, laid out to match
        make_tiled_denoise_cached's folded / chunked / sharded variants."""
        def cond2_dummy(bprime):
            return {
                "crossattn": jnp.zeros(
                    (2 * bprime,) + tuple(c["crossattn"].shape[1:]), jnp.float32),
                "vector": jnp.zeros(
                    (2 * bprime,) + tuple(c["vector"].shape[1:]), jnp.float32),
                "control": jnp.zeros(
                    (2 * bprime, tile_size, tile_size, c["control"].shape[3]),
                    jnp.float32),
            }

        x_shape = lambda bprime: (bprime, tile_size, tile_size, zc)
        if mesh is not None and "tile" in getattr(mesh, "shape", {}) \
                and mesh.shape["tile"] > 1:
            nshard = mesh.shape["tile"]
            local_t = (n_tiles + (-n_tiles) % nshard) // nshard
            one = self._feature_cache_zeros(
                params, cond2_dummy(local_t * b), x_shape(local_t * b))
            return jax.tree_util.tree_map(
                lambda a: jnp.zeros((nshard * a.shape[0],) + a.shape[1:], a.dtype),
                one,
            )
        if tile_chunk:
            ng = (n_tiles + (-n_tiles) % tile_chunk) // tile_chunk
            one = self._feature_cache_zeros(
                params, cond2_dummy(tile_chunk * b), x_shape(tile_chunk * b))
            return jax.tree_util.tree_map(
                lambda a: jnp.zeros((ng,) + a.shape, a.dtype), one)
        return self._feature_cache_zeros(
            params, cond2_dummy(n_tiles * b), x_shape(n_tiles * b))

    @_per_instance_cache(maxsize=8)
    def _tiled_sample_fn(
        self, num_steps: int, s_noise: float, tile_size: int, tile_stride: int,
        local_prompts: bool, mesh_key=None, sampler_name: str = "TiledRestoreEDM",
        tile_chunk: Optional[int] = None, segmented: bool = False,
        cache_interval: int = 0,
    ):
        from supir_tpu.parallel.tiled_sampler import (
            make_tiled_denoise,
            make_tiled_denoise_cached,
            tiled_restore_dpmpp2m_sample,
            tiled_restore_edm_sample,
            tiled_restore_edm_sample_cached,
        )

        mesh = self._tiled_mesh if mesh_key is not None else None

        def f(params, noised_z, c, uc, x_center, tables, rng, step_offset=0,
              carry=None, bt_range=None):
            # conditioning without 'control' (tiles carry their own slices)
            def _cond2(x_flat, sigma_b, control_flat, ca_flat):
                bb = x_flat.shape[0]

                def rep(a):
                    # [B, ...] -> [T*B, ...] (tile-major fold; works for B>1
                    # where a plain broadcast_to cannot)
                    reps = (bb // a.shape[0],) + (1,) * (a.ndim - 1)
                    return jnp.tile(a, reps)

                ca_uc = rep(uc["crossattn"])
                ca_c = rep(c["crossattn"]) if ca_flat is None else ca_flat
                vec_uc = rep(uc["vector"])
                vec_c = rep(c["vector"])
                cond2 = {
                    "crossattn": jnp.concatenate([ca_uc, ca_c], axis=0),
                    "vector": jnp.concatenate([vec_uc, vec_c], axis=0),
                    "control": jnp.concatenate([control_flat, control_flat], axis=0),
                }
                x2 = jnp.concatenate([x_flat, x_flat], axis=0)
                s2 = jnp.concatenate([sigma_b, sigma_b], axis=0)
                return cond2, x2, s2

            def denoise_flat(x_flat, sigma_b, cfg_b, ctrl_s, control_flat, ca_flat):
                cond2, x2, s2 = _cond2(x_flat, sigma_b, control_flat, ca_flat)
                den = self.denoiser(
                    functools.partial(self._network, params), x2, s2, cond2, ctrl_s
                )
                d_uc, d_c = jnp.split(den, 2, axis=0)
                return cfg_combine(d_uc, d_c, cfg_b)

            def denoise_flat_cached(x_flat, sigma_b, cfg_b, ctrl_s,
                                    control_flat, ca_flat, cache, rec):
                cond2, x2, s2 = _cond2(x_flat, sigma_b, control_flat, ca_flat)
                den, cache = self.denoiser.call_cached(
                    functools.partial(self._network_cached, params),
                    x2, s2, cond2, ctrl_s, cache, rec,
                )
                d_uc, d_c = jnp.split(den, 2, axis=0)
                return cfg_combine(d_uc, d_c, cfg_b), cache

            from supir_tpu.parallel.tiled_sampler import _gather_tiles, make_tile_plan

            starts, _, _ = make_tile_plan(
                noised_z.shape[1], noised_z.shape[2], tile_size, tile_stride
            )
            control_tiles = _gather_tiles(c["control"], starts, tile_size)
            ca_tiles = c.get("crossattn_tiles") if local_prompts else None
            if sampler_name == "TiledRestoreDPMPP2M":
                denoise_tile = make_tiled_denoise(
                    denoise_flat, mesh=mesh, tile_chunk=tile_chunk
                )
                return tiled_restore_dpmpp2m_sample(
                    denoise_tile, noised_z, rng, tables,
                    control_tiles=control_tiles,
                    tile_size=tile_size, tile_stride=tile_stride,
                    eta=self.cfg.sampler.eta, s_noise=s_noise,
                    crossattn_tiles=ca_tiles,
                    step_offset=step_offset, carry_in=carry,
                    bt_range=bt_range, return_carry=segmented,
                )
            if cache_interval >= 1:
                denoise_tile_cached = make_tiled_denoise_cached(
                    denoise_flat_cached, mesh=mesh, tile_chunk=tile_chunk
                )
                # cache0: fresh zeros on an unsegmented / first-segment call,
                # the threaded carry on later segments
                cache0 = carry if carry is not None else (
                    self._tiled_feature_cache_zeros(
                        params, c, noised_z.shape[0], noised_z.shape[3],
                        tile_size, len(starts), mesh, tile_chunk,
                    )
                )
                rec = (
                    np.arange(num_steps)
                    + (int(step_offset) if not segmented else 0)
                ) % cache_interval == 0
                if segmented:
                    # recompute flags must use GLOBAL step indices; with a
                    # traced step_offset compute them traced
                    rec = (jnp.arange(num_steps, dtype=jnp.int32)
                           + jnp.asarray(step_offset, jnp.int32)) % cache_interval == 0
                return tiled_restore_edm_sample_cached(
                    denoise_tile_cached, cache0, jnp.asarray(rec),
                    noised_z, rng, tables,
                    x_center=x_center, control_tiles=control_tiles,
                    tile_size=tile_size, tile_stride=tile_stride,
                    s_noise=s_noise, crossattn_tiles=ca_tiles,
                    step_offset=step_offset, return_cache=segmented,
                )
            denoise_tile = make_tiled_denoise(
                denoise_flat, mesh=mesh, tile_chunk=tile_chunk
            )
            return tiled_restore_edm_sample(
                denoise_tile, noised_z, rng, tables,
                x_center=x_center, control_tiles=control_tiles,
                tile_size=tile_size, tile_stride=tile_stride,
                s_noise=s_noise, mesh=mesh, crossattn_tiles=ca_tiles,
                step_offset=step_offset,
            )

        return jax.jit(f)

    _tiled_mesh = None

    def set_tiled_mesh(self, mesh):
        """Mesh with a 'tile' axis for sharded tiled diffusion."""
        self._tiled_mesh = mesh

    def batchify_sample_tiled(
        self,
        x: jnp.ndarray,
        c: Dict[str, jnp.ndarray],
        uc: Dict[str, jnp.ndarray],
        num_steps: int = 50,
        tile_size: int = 128,
        tile_stride: int = 64,
        restoration_scale: float = 4.0,
        s_churn: float = 0.0,
        s_noise: float = 1.003,
        cfg_scale: float = 7.5,
        seed: int = 0,
        control_scale: float = 1.0,
        color_fix_type: str = "None",
        use_linear_cfg: bool = False,
        use_linear_control_scale: bool = False,
        cfg_scale_start: float = 1.0,
        control_scale_start: float = 0.0,
        z_override: Optional[jnp.ndarray] = None,
        sampler_name: Optional[str] = None,
        tile_chunk: Optional[int] = None,
        steps_per_call: Optional[int] = None,
        noise_override: Optional[jnp.ndarray] = None,
        center_noise_override: Optional[jnp.ndarray] = None,
        feature_cache_interval: int = 0,
    ) -> jnp.ndarray:
        """Tiled restore pipeline (reference TiledRestoreEDMSampler /
        TiledRestoreDPMPP2MSampler, sampling.py:600-730): 4K+ outputs,
        tiles batched or sharded over the 'tile' mesh axis; `tile_chunk`
        bounds tiles-per-denoiser-call for single-chip HBM at 4K+;
        `steps_per_call` segments the step scan into multiple programs
        (EDM only) to bound single-program runtime.

        `feature_cache_interval` (TiledRestoreEDM only): 0 disables; N>=1
        runs the tile-indexed cross-step feature cache — the per-tile UNet
        encoder/middle + control pyramid recompute every N steps and are
        reused in between (N=1 exact, N>1 approximates; the cache threads
        across `steps_per_call` segments with global step semantics)."""
        import dataclasses as dc

        cfg = self.cfg
        sampler_name = sampler_name or (
            cfg.sampler.name if cfg.sampler.name.startswith("Tiled") else "TiledRestoreEDM"
        )
        if feature_cache_interval and sampler_name != "TiledRestoreEDM":
            raise ValueError(
                "feature_cache_interval is only supported with TiledRestoreEDM"
            )
        scfg = dc.replace(
            cfg.sampler, num_steps=num_steps, restore_cfg=restoration_scale,
            s_churn=s_churn, s_noise=s_noise,
            cfg_scale=cfg_scale_start if use_linear_cfg else cfg_scale,
            cfg_scale_min=cfg_scale, use_linear_cfg=use_linear_cfg,
        )
        if sampler_name == "TiledRestoreDPMPP2M":
            tables = S.restore_dpmpp2m_tables(
                scfg, num_steps, control_scale=control_scale,
                use_linear_control_scale=use_linear_control_scale,
                control_scale_start=control_scale_start,
            )
            sigmas = np.concatenate([tables.sigma, [0.0]]).astype(np.float32)
        else:
            sigmas = legacy_ddpm_sigmas(num_steps)
            tables = S.make_step_tables(
                sigmas, scfg, control_scale=control_scale,
                use_linear_control_scale=use_linear_control_scale,
                control_scale_start=control_scale_start,
            )
        rng = jax.random.PRNGKey(seed)
        rng_noise, rng_sample = jax.random.split(rng)

        _z = z_override if z_override is not None else self.encode_first_stage_with_denoise(x)
        x_stage1 = self.decode_first_stage(_z)
        # x_center is a SAMPLED latent in the reference (see
        # encode_first_stage docstring) — sampled under tiling too
        self._check_override("center_noise_override", center_noise_override, _z.shape)
        z_stage1 = self.encode_first_stage(
            x_stage1,
            noise=center_noise_override,
            rng=None if center_noise_override is not None
            else jax.random.fold_in(rng, 2),
        )

        self._check_override("noise_override", noise_override, _z.shape)
        if noise_override is not None:
            noised_z = jnp.asarray(noise_override, jnp.float32)
        else:
            noised_z = jax.random.normal(rng_noise, _z.shape, jnp.float32)
        noised_z = noised_z * np.sqrt(1.0 + float(sigmas[0]) ** 2)

        local_prompts = "crossattn_tiles" in c
        cache_iv = int(feature_cache_interval)
        fn = self._tiled_sample_fn(
            num_steps, s_noise, tile_size, tile_stride, local_prompts,
            mesh_key=id(self._tiled_mesh) if self._tiled_mesh is not None else None,
            sampler_name=sampler_name, tile_chunk=tile_chunk,
            cache_interval=cache_iv,
        )
        if steps_per_call and steps_per_call < num_steps:
            # run the step scan in segments of steps_per_call: bounds single-
            # program runtime (remote runtimes can kill long executions) at
            # identical math — tables are sliced exactly, and per-step noise
            # keys are fold_in(rng, global_step) so segmentation is
            # bit-invariant: steps_per_call in {None, 5, 10} give identical
            # outputs for a fixed seed.
            is_dpmpp = sampler_name == "TiledRestoreDPMPP2M"
            carries_cache = cache_iv >= 1 and not is_dpmpp
            x_cur = noised_z
            carry = None
            bt_range = None
            if is_dpmpp:
                # DPM++2M carries (old_denoised, prev_sigma) across steps;
                # thread it across segments and pin the Brownian-tree range
                # to the GLOBAL schedule so the SDE noise stream is
                # segmentation-invariant (the tree is keyed by sigma
                # intervals, not step indices)
                carry = (jnp.zeros_like(noised_z),
                         jnp.ones((), jnp.float32))
                bt_range = (jnp.float32(tables.sigma[-1]),
                            jnp.float32(tables.sigma[0]))
            for i in range(0, num_steps, steps_per_call):
                seg_tables = jax.tree_util.tree_map(
                    lambda a: a[i : i + steps_per_call], tables
                )
                seg_fn = self._tiled_sample_fn(
                    int(len(seg_tables.sigma)), s_noise, tile_size, tile_stride,
                    local_prompts,
                    mesh_key=id(self._tiled_mesh) if self._tiled_mesh is not None else None,
                    sampler_name=sampler_name, tile_chunk=tile_chunk,
                    segmented=is_dpmpp or carries_cache,
                    cache_interval=cache_iv,
                )
                if carries_cache:
                    # the feature cache threads across segments; recompute
                    # flags inside use GLOBAL step indices via step_offset
                    x_cur, carry = seg_fn(
                        self.params, x_cur, c, uc, z_stage1, seg_tables,
                        rng_sample, jnp.int32(i), carry,
                    )
                    continue
                if is_dpmpp:
                    x_cur, carry = seg_fn(
                        self.params, x_cur, c, uc, z_stage1, seg_tables,
                        rng_sample, jnp.int32(i), carry, bt_range,
                    )
                else:
                    x_cur = seg_fn(
                        self.params, x_cur, c, uc, z_stage1, seg_tables,
                        rng_sample, jnp.int32(i),
                    )
            samples_z = x_cur
        else:
            samples_z = fn(self.params, noised_z, c, uc, z_stage1, tables, rng_sample)
        samples = self.decode_first_stage(samples_z)
        if color_fix_type == "Wavelet":
            samples = wavelet_reconstruction(samples, x_stage1)
        elif color_fix_type == "AdaIn":
            samples = adaptive_instance_normalization(samples, x_stage1)
        return samples

    def batchify_sample(
        self,
        x: jnp.ndarray,
        c: Dict[str, jnp.ndarray],
        uc: Dict[str, jnp.ndarray],
        num_steps: int = 50,
        restoration_scale: float = 4.0,
        s_churn: float = 0.0,
        s_noise: float = 1.003,
        cfg_scale: float = 7.5,
        seed: int = 0,
        control_scale: float = 1.0,
        color_fix_type: str = "None",
        use_linear_cfg: bool = False,
        use_linear_control_scale: bool = False,
        cfg_scale_start: float = 1.0,
        control_scale_start: float = 0.0,
        sampler_name: Optional[str] = None,
        z_override: Optional[jnp.ndarray] = None,
        noise_override: Optional[jnp.ndarray] = None,
        center_noise_override: Optional[jnp.ndarray] = None,
        feature_cache_interval: int = 0,
    ) -> jnp.ndarray:
        """Full stage-2 pipeline on an LQ image batch [B,H,W,3] in [-1,1].

        `feature_cache_interval` (RestoreEDM only): 0 disables; N>=1 runs
        the cross-step feature cache, recomputing the UNet encoder/middle +
        control pyramid every N steps and reusing them in between
        (DeepCache-style opt-in speedup; N=1 is exact, N>1 approximates).

        `c`/`uc` must come from `prepare_condition` (their 'control' entry is
        recomputed here from x to guarantee consistency is the caller's
        choice; we use them as given).
        """
        import dataclasses as dc

        assert color_fix_type in ("Wavelet", "AdaIn", "None")
        cfg = self.cfg
        sampler_name = sampler_name or cfg.sampler.name

        scfg = dc.replace(
            cfg.sampler,
            num_steps=num_steps,
            restore_cfg=restoration_scale,
            s_churn=s_churn,
            s_noise=s_noise,
            cfg_scale=cfg_scale_start if use_linear_cfg else cfg_scale,
            cfg_scale_min=cfg_scale,
            use_linear_cfg=use_linear_cfg,
        )
        if sampler_name == "RestoreDPMPP2M":
            tables = S.restore_dpmpp2m_tables(
                scfg,
                num_steps,
                control_scale=control_scale,
                use_linear_control_scale=use_linear_control_scale,
                control_scale_start=control_scale_start,
            )
            sigmas = None
            sigma0 = tables.sigma[0]
        elif sampler_name == "Substep":
            # fixed 1000-step subset (reference SubstepSampler, sampling.py:372)
            sigmas = S.substep_sigmas(num_steps)
            tables = S.make_step_tables(
                sigmas, scfg, control_scale=control_scale,
                use_linear_control_scale=use_linear_control_scale,
                control_scale_start=control_scale_start,
            )
            sigma0 = sigmas[0]
            sampler_name = "EulerAncestral"
        else:
            sigmas = legacy_ddpm_sigmas(num_steps)
            tables = S.make_step_tables(
                sigmas,
                scfg,
                control_scale=control_scale,
                use_linear_control_scale=use_linear_control_scale,
                control_scale_start=control_scale_start,
            )
            sigma0 = sigmas[0]

        rng = jax.random.PRNGKey(seed)
        rng_noise, rng_sample = jax.random.split(rng)

        _z = z_override if z_override is not None else self.encode_first_stage_with_denoise(x)
        x_stage1 = self.decode_first_stage(_z)
        # x_center is a SAMPLED latent in the reference
        # (AutoencoderKLInferenceWrapper.encode, autoencoder.py:319-321);
        # `center_noise_override` injects the posterior's unit noise for
        # parity harnesses, `rng` samples it from the seed otherwise
        self._check_override("center_noise_override", center_noise_override, _z.shape)
        self._check_override("noise_override", noise_override, _z.shape)
        z_stage1 = self.encode_first_stage(
            x_stage1,
            noise=center_noise_override,
            rng=None if center_noise_override is not None
            else jax.random.fold_in(rng, 2),
        )

        # `noise_override` injects the unit-variance init noise (parity
        # harnesses / reproducible runs); the sqrt(1+sigma0^2) scale is the
        # reference's prepare_sampling_loop contract (sampling.py:51)
        if noise_override is not None:
            noised_z = jnp.asarray(noise_override, jnp.float32)
        else:
            noised_z = jax.random.normal(rng_noise, _z.shape, jnp.float32)
        noised_z = noised_z * np.sqrt(1.0 + float(sigma0) ** 2)

        if feature_cache_interval and sampler_name != "RestoreEDM":
            raise ValueError(
                "feature_cache_interval is only supported with RestoreEDM"
            )
        fn = self._sample_fn(
            sampler_name, num_steps, cfg.sampler.eta, s_noise,
            seq_mesh_key=id(self._seq_mesh) if self._seq_mesh is not None else None,
            cache_interval=int(feature_cache_interval),
        )
        samples_z = fn(self.params, noised_z, c, uc, z_stage1, tables, rng_sample)
        samples = self.decode_first_stage(samples_z)

        if color_fix_type == "Wavelet":
            samples = wavelet_reconstruction(samples, x_stage1)
        elif color_fix_type == "AdaIn":
            samples = adaptive_instance_normalization(samples, x_stage1)
        return samples
