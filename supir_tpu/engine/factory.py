"""Engine construction: random init (tests) or checkpoint load.

Replaces `SUPIR/util.py:create_SUPIR_model` (OmegaConf reflection + layered
torch state_dict loads) with explicit param-tree assembly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from supir_tpu.config import SUPIRConfig, UNetConfig
from supir_tpu.engine.supir import SUPIREngine
from supir_tpu.models.control import GLVControl, LightGLVUNet
from supir_tpu.models.embedders import Conditioner, ConditionerConfig
from supir_tpu.models.vae import AutoencoderKL


def tiny_test_config():
    """A width-scaled config whose conditioner/unet dims are consistent,
    for fast CPU pipeline tests."""
    cond_cfg = ConditionerConfig().tiny()
    ctx = cond_cfg.clip_l.width + cond_cfg.clip_bigg.width  # crossattn dim
    adm = cond_cfg.clip_bigg.projection_dim + 6 * cond_cfg.vector_outdim
    unet = dataclasses.replace(
        UNetConfig().tiny(), context_dim=ctx, adm_in_channels=adm
    )
    base = SUPIRConfig.tiny()
    cfg = dataclasses.replace(
        base,
        unet=unet,
        control=dataclasses.replace(base.control, unet=unet),
        ae_dtype="fp32",
        diffusion_dtype="fp32",
    )
    return cfg, cond_cfg


def init_params(
    cfg: SUPIRConfig,
    cond_cfg: Optional[ConditionerConfig],
    rng: jax.Array,
    image_size: int = 64,
    param_dtype=None,
):
    """Random-init the full parameter tree (shapes only matter).

    param_dtype=jnp.bfloat16 fuses init+cast inside one jit per branch so
    the fp32 tree never fully materializes in HBM (full SDXL width is
    ~13.6 GB fp32 — over half a v5e chip).
    """
    k_vae, k_ctrl, k_unet, k_cond = jax.random.split(rng, 4)
    f = cfg.vae.downscale_factor
    lat = image_size // f

    def cast(tree):
        if param_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda v: v.astype(param_dtype) if v.dtype == jnp.float32 else v, tree
        )

    def jinit(init_fn, key):
        return jax.jit(lambda k: cast(init_fn(k)["params"]))(key)

    vae = AutoencoderKL(cfg.vae)
    vae_params = jinit(
        lambda k: vae.init(k, jnp.zeros((1, image_size, image_size, 3))), k_vae
    )

    x = jnp.zeros((1, lat, lat, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 77, cfg.unet.context_dim))
    y = jnp.zeros((1, cfg.unet.adm_in_channels))

    control_net = GLVControl(cfg.unet, input_upscale=cfg.control.input_upscale)
    ctrl_params = jinit(lambda k: control_net.init(k, x, t, x, ctx, y), k_ctrl)
    control = jax.eval_shape(
        lambda p: control_net.apply({"params": p}, x, t, x, ctx, y), ctrl_params
    )
    control = [jnp.zeros(c.shape, jnp.float32) for c in control]

    unet = LightGLVUNet(cfg.unet, cfg.control)
    unet_params = jinit(lambda k: unet.init(k, x, t, ctx, y, control), k_unet)

    params = {"vae": vae_params, "control": ctrl_params, "unet": unet_params}
    if cond_cfg is not None:
        conditioner = Conditioner(cond_cfg)
        tok = jnp.zeros((1, 77), jnp.int32)
        size = jnp.zeros((1, 2))
        params["conditioner"] = jinit(
            lambda k: conditioner.init(k, tok, tok, size, size, size), k_cond
        )
    return params


def eval_shape_params(
    cfg: SUPIRConfig,
    cond_cfg: Optional[ConditionerConfig] = None,
    image_size: int = 64,
):
    """The full parameter tree as jax.ShapeDtypeStructs — no memory, no
    compute. Used to validate checkpoint-converter output shapes at real
    SDXL width without materializing ~13.6 GB of parameters."""
    rng = jax.random.PRNGKey(0)
    f = cfg.vae.downscale_factor
    lat = image_size // f

    vae = AutoencoderKL(cfg.vae)
    x_img = jnp.zeros((1, image_size, image_size, 3))
    vae_params = jax.eval_shape(lambda k: vae.init(k, x_img)["params"], rng)

    x = jnp.zeros((1, lat, lat, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 77, cfg.unet.context_dim))
    y = jnp.zeros((1, cfg.unet.adm_in_channels))

    control_net = GLVControl(cfg.unet, input_upscale=cfg.control.input_upscale)
    ctrl_params = jax.eval_shape(
        lambda k: control_net.init(k, x, t, x, ctx, y)["params"], rng
    )
    control_shapes = jax.eval_shape(
        lambda p: control_net.apply({"params": p}, x, t, x, ctx, y), ctrl_params
    )
    control = [jnp.zeros(c.shape, jnp.float32) for c in control_shapes]

    unet = LightGLVUNet(cfg.unet, cfg.control)
    unet_params = jax.eval_shape(
        lambda k: unet.init(k, x, t, ctx, y, control)["params"], rng
    )

    params = {"vae": vae_params, "control": ctrl_params, "unet": unet_params}
    if cond_cfg is not None:
        conditioner = Conditioner(cond_cfg)
        tok = jnp.zeros((1, 77), jnp.int32)
        size = jnp.zeros((1, 2))
        params["conditioner"] = jax.eval_shape(
            lambda k: conditioner.init(k, tok, tok, size, size, size)["params"], rng
        )
    return params


def create_engine(
    cfg: Optional[SUPIRConfig] = None,
    cond_cfg: Optional[ConditionerConfig] = None,
    params=None,
    rng: Optional[jax.Array] = None,
    image_size: int = 64,
    param_dtype=None,
) -> SUPIREngine:
    cfg = cfg or SUPIRConfig()
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params = init_params(
            cfg, cond_cfg, rng, image_size=image_size, param_dtype=param_dtype
        )
    return SUPIREngine(cfg, params, cond_cfg=cond_cfg)
