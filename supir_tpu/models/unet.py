"""SDXL UNet, TPU-native.

Behavioral contract: `sgm/modules/diffusionmodules/openaimodel.py:506-1020`
(UNetModel with the XL-base config of options/SUPIR_v0.yaml:43-64). The
encoder (input blocks + middle) is factored into `UNetEncoder` so the
GLVControl control-net (a trainable encoder copy) reuses it directly.

TPU-first notes:
  - NHWC everywhere; skip connections concatenate on the minor (channel)
    axis, which XLA fuses into the following conv.
  - The reference wraps `Upsample` in an fp32 autocast island to dodge a
    CUDA bf16-nearest bug (openaimodel.py:131-147); TPU bf16 nearest-neighbor
    is exact (pure data movement), so no island is needed.
  - Activation rematerialization is applied per ResBlock/transformer via
    `flax.linen.remat` when `remat=True` (replaces CheckpointFunction).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from supir_tpu.config import UNetConfig
from supir_tpu.models.attention import SpatialTransformer
from supir_tpu.models.layers import (
    Conv,
    Dense,
    GroupNorm32,
    TimestepEmbedMLP,
    timestep_embedding,
)

Dtype = Any


class ResBlock(nn.Module):
    """GN32 -> SiLU -> conv; + time-emb projection; GN32 -> SiLU -> zero conv;
    residual with 1x1 skip when channels change (openaimodel.py:213-305)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        h = GroupNorm32(fuse_silu=True, dtype=self.dtype, name="in_norm")(x)
        h = Conv(self.out_channels, 3, dtype=self.dtype, name="in_conv")(h)
        emb_out = Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(
            nn.silu(emb)
        )
        h = h + emb_out[:, None, None, :]
        h = GroupNorm32(fuse_silu=True, dtype=self.dtype, name="out_norm")(h)
        h = Conv(self.out_channels, 3, zero_init=True, dtype=self.dtype, name="out_conv")(h)
        if x.shape[-1] != self.out_channels:
            x = Conv(self.out_channels, 1, dtype=self.dtype, name="skip")(x)
        return x + h


class Downsample(nn.Module):
    """3x3 conv stride 2 (openaimodel.py:177-211)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv(self.out_channels, 3, stride=2, dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest 2x + 3x3 conv (openaimodel.py:112-148)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = x[:, :, None, :, None, :]
        x = jnp.broadcast_to(x, (n, h, 2, w, 2, c)).reshape(n, 2 * h, 2 * w, c)
        return Conv(self.out_channels, 3, dtype=self.dtype, name="conv")(x)


def encoder_feature_channels(cfg: UNetConfig) -> List[int]:
    """Channel count of each saved encoder feature (input_block_chans)."""
    chans = [cfg.model_channels]
    ch = cfg.model_channels
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            ch = mult * cfg.model_channels
            chans.append(ch)
        if level != cfg.levels - 1:
            chans.append(ch)
    return chans


class UNetEncoder(nn.Module):
    """Input blocks + middle block; returns (hs, h_middle).

    `hint` (when given) is added after the first conv block — this is the
    GLVControl guided-hint injection point (SUPIR_v0.py:520-531).
    """

    cfg: UNetConfig
    attn_impl: str = "auto"
    remat: bool = False
    # When True, stop gradients on the input-block features and the
    # pre-middle state, but leave the middle block trainable — the
    # reference's no_grad region covers time_embed + input_blocks only;
    # middle_block trains (SUPIR_v0.py:617-633).
    stop_grad_inputs: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, context, hint=None):
        cfg = self.cfg
        res_block = nn.remat(ResBlock) if self.remat else ResBlock
        st_block = nn.remat(SpatialTransformer) if self.remat else SpatialTransformer

        def attn(ch, depth, name):
            heads = ch // cfg.num_head_channels
            return st_block(
                in_channels=ch,
                heads=heads,
                dim_head=cfg.num_head_channels,
                depth=depth,
                context_dim=cfg.context_dim,
                attn_impl=self.attn_impl,
                dtype=self.dtype,
                name=name,
            )

        hs = []
        h = Conv(cfg.model_channels, 3, dtype=self.dtype, name="conv_in")(x)
        if hint is not None:
            h = h + hint
        hs.append(h)

        ch = cfg.model_channels
        ds = 1
        block_idx = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = mult * cfg.model_channels
                h = res_block(out_channels=ch, dtype=self.dtype, name=f"in_{block_idx}_res")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = attn(ch, cfg.transformer_depth[level], f"in_{block_idx}_attn")(h, context)
                hs.append(h)
                block_idx += 1
            if level != cfg.levels - 1:
                h = Downsample(ch, dtype=self.dtype, name=f"in_{block_idx}_down")(h)
                hs.append(h)
                block_idx += 1
                ds *= 2

        if self.stop_grad_inputs:
            hs = [jax.lax.stop_gradient(t) for t in hs]
            h = jax.lax.stop_gradient(h)

        h = res_block(out_channels=ch, dtype=self.dtype, name="mid_res1")(h, emb)
        h = attn(ch, cfg.middle_depth, "mid_attn")(h, context)
        h = res_block(out_channels=ch, dtype=self.dtype, name="mid_res2")(h, emb)
        return hs, h


class TimeEmbedding(nn.Module):
    """Sinusoidal t -> MLP, plus the SDXL ADM vector head (label_emb)."""

    cfg: UNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps, y=None):
        cfg = self.cfg
        t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(self.dtype)
        emb = TimestepEmbedMLP(cfg.model_channels * 4, dtype=self.dtype, name="time_embed")(t_emb)
        if cfg.adm_in_channels is not None:
            assert y is not None, "class-conditional model needs y"
            emb = emb + TimestepEmbedMLP(
                cfg.model_channels * 4, dtype=self.dtype, name="label_emb"
            )(y.astype(self.dtype))
        return emb


class UNetDecoderPlain(nn.Module):
    """Standard SDXL decoder: concat skip, res(+attn), upsample."""

    cfg: UNetConfig
    attn_impl: str = "auto"
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, hs, emb, context):
        cfg = self.cfg
        res_block = nn.remat(ResBlock) if self.remat else ResBlock
        hs = list(hs)
        ds = 2 ** (cfg.levels - 1)
        block_idx = 0
        for rlevel, mult in enumerate(reversed(cfg.channel_mult)):
            level = cfg.levels - 1 - rlevel
            ch = mult * cfg.model_channels
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
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
                    h = Upsample(ch, dtype=self.dtype, name=f"out_{block_idx}_up")(h)
                    ds //= 2
                block_idx += 1
        return h


class OutputHead(nn.Module):
    """GN32 -> SiLU -> zero conv to out_channels."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        h = GroupNorm32(fuse_silu=True, dtype=self.dtype, name="norm")(h)
        return Conv(self.out_channels, 3, zero_init=True, dtype=self.dtype, name="conv")(h)


class UNetModel(nn.Module):
    """Plain SDXL UNet (txt2img path; also the base for LightGLVUNet)."""

    cfg: UNetConfig
    attn_impl: str = "auto"
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context, y=None):
        x = x.astype(self.dtype)
        context = context.astype(self.dtype)
        emb = TimeEmbedding(self.cfg, dtype=self.dtype, name="time")(timesteps, y)
        hs, h = UNetEncoder(
            self.cfg, attn_impl=self.attn_impl, remat=self.remat, dtype=self.dtype, name="enc"
        )(x, emb, context)
        h = UNetDecoderPlain(
            self.cfg, attn_impl=self.attn_impl, remat=self.remat, dtype=self.dtype, name="dec"
        )(h, hs, emb, context)
        out = OutputHead(self.cfg.out_channels, dtype=self.dtype, name="out")(h)
        return out.astype(jnp.float32)
