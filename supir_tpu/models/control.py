"""SUPIR control path: GLVControl, ZeroSFT, ZeroCrossAttn, LightGLVUNet.

Behavioral contract: `SUPIR/modules/SUPIR_v0.py` —
  - GLVControl (:155-540): a trainable copy of the SDXL UNet encoder+middle
    that consumes the LQ latent through a zero-init hint conv plus the noisy
    latent, and returns all 9 input-block features + the middle feature.
  - ZeroSFT (:62-113): zero-init spatial feature transform applied to each
    decoder skip; blends with the unmodulated stream by control_scale.
  - ZeroCrossAttn (:116-152): GroupNorm both streams, cross-attend
    x <- context, residual scaled by control_scale.
  - LightGLVUNet (:543-666): SDXL UNet whose decoder consumes the control
    features; the XL-base channel tables (:547-552) are the checkpoint
    contract and live in `supir_tpu.config.ControlConfig`.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from supir_tpu.config import ControlConfig, UNetConfig
from supir_tpu.models.attention import CrossAttention
from supir_tpu.models.layers import Conv, GroupNorm32
from supir_tpu.models.unet import (
    OutputHead,
    TimeEmbedding,
    UNetEncoder,
    Upsample,
    ResBlock,
)
from supir_tpu.models.attention import SpatialTransformer
from supir_tpu.ops.resize import bilinear_resize

Dtype = Any


class ZeroConv(nn.Module):
    """1x1 zero-init additive injector (SUPIR_v0.py:45-59; unused by the
    v0 configs but part of the project_type surface)."""

    norm_nc: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c, h, h_ori=None):
        h = h + Conv(self.norm_nc, 1, zero_init=True, dtype=self.dtype, name="zero_conv")(c)
        if h_ori is not None:
            h = jnp.concatenate([h_ori, h], axis=-1)
        return h


class ZeroSFT(nn.Module):
    """Zero-init SFT modulation of a decoder skip feature.

    forward(c, h, h_ori): c = control feature [label_nc], h = skip feature
    [norm_nc], h_ori = decoder stream [concat_channels] or None.
    """

    label_nc: int
    norm_nc: int
    concat_channels: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c, h, h_ori=None, control_scale=1.0, mask=None):
        """`mask`: optional 0/1 scalar for progressive training unmasking
        (SUPIR_v0.py:98-110): when masked (1), the control contribution
        (zero_conv add, gamma, beta) is zeroed but the GroupNorm and the
        control_scale blend still apply."""
        keep = 1.0 if mask is None else 1.0 - jnp.asarray(mask, self.dtype)
        pre_concat = self.concat_channels != 0
        if h_ori is not None and pre_concat:
            h_raw = jnp.concatenate([h_ori, h], axis=-1)
        else:
            h_raw = h

        h = h + Conv(self.norm_nc, 1, zero_init=True, dtype=self.dtype, name="zero_conv")(c) * keep
        if h_ori is not None and pre_concat:
            h = jnp.concatenate([h_ori, h], axis=-1)

        actv = nn.silu(Conv(128, 3, dtype=self.dtype, name="mlp_shared")(c))
        gamma = Conv(
            self.norm_nc + self.concat_channels, 3, zero_init=True, dtype=self.dtype, name="zero_mul"
        )(actv) * keep
        beta = Conv(
            self.norm_nc + self.concat_channels, 3, zero_init=True, dtype=self.dtype, name="zero_add"
        )(actv) * keep
        h = GroupNorm32(dtype=self.dtype, name="norm")(h) * (gamma + 1.0) + beta
        if h_ori is not None and not pre_concat:
            h = jnp.concatenate([h_ori, h], axis=-1)
        return h * control_scale + h_raw * (1.0 - control_scale)


class ZeroCrossAttn(nn.Module):
    """Cross-attention injector: x attends to the control feature.

    Note: despite the name, the reference does NOT zero-init the output
    projection (the zero_module call is commented out, SUPIR_v0.py:133-136).
    """

    context_dim: int
    query_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, context, x, control_scale=1.0, mask=None):
        keep = 1.0 if mask is None else 1.0 - jnp.asarray(mask, self.dtype)
        x_in = x
        x = GroupNorm32(dtype=self.dtype, name="norm1")(x)
        context = GroupNorm32(dtype=self.dtype, name="norm2")(context)
        b, h, w, c = x.shape
        bc, hc, wc, cc = context.shape
        x = x.reshape(b, h * w, c)
        context = context.reshape(bc, hc * wc, cc)
        x = CrossAttention(
            query_dim=self.query_dim,
            context_dim=self.context_dim,
            heads=self.query_dim // 64,
            dim_head=64,
            dtype=self.dtype,
            name="attn",
        )(x, context)
        x = x.reshape(b, h, w, c) * keep
        return x_in + x * control_scale


class GLVControl(nn.Module):
    """Control net: UNet encoder clone + zero hint conv; returns the
    10-feature pyramid (9 input-block features + middle)."""

    cfg: UNetConfig
    input_upscale: int = 1
    attn_impl: str = "auto"
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, xt, context, y):
        """x: LQ control latent [B,H,W,4]; xt: noisy latent [B,H,W,4]."""
        x = x.astype(self.dtype)
        xt = xt.astype(self.dtype)
        context = context.astype(self.dtype)
        if self.input_upscale != 1:
            b, h, w, c = x.shape
            x = bilinear_resize(
                x, (h * self.input_upscale, w * self.input_upscale), antialias=True
            )
        emb = TimeEmbedding(self.cfg, dtype=self.dtype, name="time")(timesteps, y)
        hint = Conv(
            self.cfg.model_channels, 3, zero_init=True, dtype=self.dtype, name="input_hint_block"
        )(x)
        hs, h_mid = UNetEncoder(
            self.cfg, attn_impl=self.attn_impl, remat=self.remat, dtype=self.dtype, name="enc"
        )(xt, emb, context, hint=hint)
        return list(hs) + [h_mid]


def _build_adapter_specs(ctrl: ControlConfig):
    """The project_modules list: 10 ZeroSFTs (one per control feature) with
    ZeroCrossAttns inserted at the mode-table indices (SUPIR_v0.py:564-580).

    Returns a list of ('sft'|'xattn', i) where i indexes the *original*
    (pre-insert) tables."""
    specs = [("sft", i) for i in range(len(ctrl.cond_output_channels))]
    for idx in ctrl.cross_attn_insert_idx:  # insert 6 then 3 (order matters)
        specs.insert(idx, ("xattn", idx))
    return specs


# XL-base progressive training schedule (SUPIR_v0.py:552): each stage
# unmasks more project modules; stages are consumed back-to-front.
PROGRESSIVE_MASK_NUMS_XL_BASE = (0, 3, 7, 11)


def progressive_adapter_masks(ctrl: ControlConfig, stage: int) -> jnp.ndarray:
    """The reference's `step_progressive_mask` (SUPIR_v0.py:583-597) as data:
    stage 0 masks the first progressive_mask_nums[-1] adapters, each later
    stage unmasks more; stage >= len(nums) leaves everything unmasked.
    Returns a float [num_adapters] vector (1 = masked)."""
    nums = PROGRESSIVE_MASK_NUMS_XL_BASE
    n_adapters = len(ctrl.cond_output_channels) + len(ctrl.cross_attn_insert_idx)
    if stage >= len(nums):
        mask_num = 0
    else:
        mask_num = nums[len(nums) - 1 - stage]
    return jnp.asarray(
        [1.0 if i < mask_num else 0.0 for i in range(n_adapters)], jnp.float32
    )


class LightGLVUNet(nn.Module):
    """SDXL UNet with control injection in the decoder.

    forward(x, t, context, y, control, control_scale) -> eps prediction.
    Trainability matches the reference no_grad region (SUPIR_v0.py:617-633):
    time embedding and input blocks are frozen; the middle block, adaptors,
    and decoder train.

    `adapter_masks`: optional [num_adapters] 0/1 vector (see
    `progressive_adapter_masks`) for progressive training unmasking.
    """

    cfg: UNetConfig
    ctrl: ControlConfig
    attn_impl: str = "auto"
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context, y, control: Sequence[jnp.ndarray],
                 control_scale=1.0, adapter_masks: Optional[jnp.ndarray] = None,
                 feature_cache=None, return_features: bool = False):
        """`feature_cache=(hs_tuple, h_mid)` skips the encoder+middle and
        reuses those features (DeepCache/encoder-propagation approximation:
        they drift slowly across adjacent sigmas — PAPERS.md items 2/3);
        the decoder, adapters, and time embedding still run fresh.
        `return_features=True` additionally returns the (hs, h) captured
        this call so a sampler can carry them across steps."""
        cfg = self.cfg
        ctrl = self.ctrl
        x = x.astype(self.dtype)
        context = context.astype(self.dtype)
        control = [c.astype(self.dtype) for c in control]

        emb = TimeEmbedding(cfg, dtype=self.dtype, name="time")(timesteps, y)
        emb = jax.lax.stop_gradient(emb)
        if feature_cache is None:
            hs, h = UNetEncoder(
                cfg, attn_impl=self.attn_impl, remat=self.remat,
                stop_grad_inputs=True, dtype=self.dtype, name="enc"
            )(x, emb, context)
        else:
            hs = [f.astype(self.dtype) for f in feature_cache[0]]
            h = feature_cache[1].astype(self.dtype)
        feats = (tuple(hs), h) if return_features else None

        specs = _build_adapter_specs(ctrl)

        def make_adapter(pos):
            kind, i = specs[pos]
            if kind == "sft":
                return ZeroSFT(
                    label_nc=ctrl.project_channels[i],
                    norm_nc=ctrl.cond_output_channels[i],
                    concat_channels=ctrl.concat_channels[i],
                    dtype=self.dtype,
                    name=f"proj_{pos}",
                )
            return ZeroCrossAttn(
                context_dim=ctrl.cond_output_channels[i],
                query_dim=ctrl.concat_channels[i],
                dtype=self.dtype,
                name=f"proj_{pos}",
            )

        def amask(pos):
            return None if adapter_masks is None else adapter_masks[pos]

        adapter_idx = len(specs) - 1
        control_idx = len(control) - 1

        # middle-feature SFT (h_ori=None; concat_channels[last]=0)
        h = make_adapter(adapter_idx)(
            control[control_idx], h, control_scale=control_scale, mask=amask(adapter_idx)
        )
        adapter_idx -= 1
        control_idx -= 1

        ds = 2 ** (cfg.levels - 1)
        block_idx = 0
        res_block = nn.remat(ResBlock) if self.remat else ResBlock
        for rlevel, mult in enumerate(reversed(cfg.channel_mult)):
            level = cfg.levels - 1 - rlevel
            ch = mult * cfg.model_channels
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                # SFT the skip feature, concatenating the decoder stream in front
                h = make_adapter(adapter_idx)(
                    control[control_idx], skip, h, control_scale=control_scale,
                    mask=amask(adapter_idx),
                )
                adapter_idx -= 1
                h = res_block(out_channels=ch, dtype=self.dtype, name=f"out_{block_idx}_res")(h, emb)
                if ds in cfg.attention_resolutions:
                    heads = ch // cfg.num_head_channels
                    h = SpatialTransformer(
                        in_channels=ch,
                        heads=heads,
                        dim_head=cfg.num_head_channels,
                        depth=cfg.transformer_depth[level],
                        context_dim=cfg.context_dim,
                        attn_impl=self.attn_impl,
                        dtype=self.dtype,
                        name=f"out_{block_idx}_attn",
                    )(h, context)
                if level > 0 and i == cfg.num_res_blocks:
                    # extra ZeroCrossAttn before each Upsample (SUPIR_v0.py:641-652)
                    h = make_adapter(adapter_idx)(
                        control[control_idx], h, control_scale=control_scale,
                        mask=amask(adapter_idx),
                    )
                    adapter_idx -= 1
                    h = Upsample(ch, dtype=self.dtype, name=f"out_{block_idx}_up")(h)
                    ds //= 2
                control_idx -= 1
                block_idx += 1

        assert adapter_idx == -1 and control_idx == -1, (adapter_idx, control_idx)
        out = OutputHead(cfg.out_channels, dtype=self.dtype, name="out")(h)
        out = out.astype(jnp.float32)
        return (out, feats) if return_features else out
