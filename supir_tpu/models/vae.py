"""AutoencoderKL (SD VAE, f8/z4) — encoder, decoder, and the SUPIR
degradation-robust `denoise_encoder` (a second parameter set with identical
architecture).

Behavioral contract: `sgm/modules/diffusionmodules/model.py` (ResnetBlock:91,
AttnBlock:158, Encoder:482, Decoder:599) and `sgm/models/autoencoder.py`
(AutoencoderKL:282, AutoencoderKLInferenceWrapper:319). GroupNorm uses
eps=1e-6 (the VAE convention); the latent distribution is diagonal Gaussian
with moments from a 1x1 quant conv.

TPU-first: NHWC; attention in the mid block uses the shared attention op;
all norm statistics in fp32 (the reference bans fp16 in the AE,
SUPIR_model.py:24 — we run bf16 which is safe on TPU).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from supir_tpu.config import VAEConfig
from supir_tpu.models.layers import Conv, GroupNorm32
from supir_tpu.ops import dot_product_attention

Dtype = Any


class VAEResnetBlock(nn.Module):
    out_channels: int
    norm_axis: str | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, tile_weight=None):
        h = GroupNorm32(eps=1e-6, axis_name=self.norm_axis, fuse_silu=True, dtype=self.dtype, name="norm1")(x, tile_weight)
        h = Conv(self.out_channels, 3, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(eps=1e-6, axis_name=self.norm_axis, fuse_silu=True, dtype=self.dtype, name="norm2")(h, tile_weight)
        h = Conv(self.out_channels, 3, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = Conv(self.out_channels, 1, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention (model.py:158-199)."""

    norm_axis: str | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, tile_weight=None):
        b, h, w, c = x.shape
        hid = GroupNorm32(eps=1e-6, axis_name=self.norm_axis, dtype=self.dtype, name="norm")(x, tile_weight)
        q = Conv(c, 1, dtype=self.dtype, name="q")(hid).reshape(b, h * w, 1, c)
        k = Conv(c, 1, dtype=self.dtype, name="k")(hid).reshape(b, h * w, 1, c)
        v = Conv(c, 1, dtype=self.dtype, name="v")(hid).reshape(b, h * w, 1, c)
        out = dot_product_attention(q, k, v).reshape(b, h, w, c)
        out = Conv(c, 1, dtype=self.dtype, name="proj_out")(out)
        return x + out


class VAEEncoder(nn.Module):
    """conv_in -> levels x (2 ResnetBlocks [+ downsample]) -> mid
    (res, attn, res) -> GN/SiLU -> conv_out (2*z_channels)."""

    cfg: VAEConfig
    norm_axis: str | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, tile_weight=None):
        cfg = self.cfg
        x = x.astype(self.dtype)
        h = Conv(cfg.ch, 3, dtype=self.dtype, name="conv_in")(x)
        for level, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for i in range(cfg.num_res_blocks):
                h = VAEResnetBlock(ch, norm_axis=self.norm_axis, dtype=self.dtype, name=f"down_{level}_block_{i}")(h, tile_weight)
            if level != len(cfg.ch_mult) - 1:
                # asymmetric pad (0,1,0,1) + stride-2 valid conv (model.py:452-460)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = Conv(
                    ch, 3, stride=2, padding=[(0, 0), (0, 0)],
                    dtype=self.dtype, name=f"down_{level}_downsample",
                )(h)
        h = VAEResnetBlock(ch, norm_axis=self.norm_axis, dtype=self.dtype, name="mid_block_1")(h, tile_weight)
        h = VAEAttnBlock(norm_axis=self.norm_axis, dtype=self.dtype, name="mid_attn_1")(h, tile_weight)
        h = VAEResnetBlock(ch, norm_axis=self.norm_axis, dtype=self.dtype, name="mid_block_2")(h, tile_weight)
        h = GroupNorm32(eps=1e-6, axis_name=self.norm_axis, fuse_silu=True, dtype=self.dtype, name="norm_out")(h, tile_weight)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return Conv(out_ch, 3, dtype=self.dtype, name="conv_out")(h)


class VAEDecoder(nn.Module):
    """conv_in -> mid -> reversed levels x (3 ResnetBlocks [+ upsample])
    -> GN/SiLU -> conv_out."""

    cfg: VAEConfig
    norm_axis: str | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, tile_weight=None):
        cfg = self.cfg
        z = z.astype(self.dtype)
        ch = cfg.ch * cfg.ch_mult[-1]
        h = Conv(ch, 3, dtype=self.dtype, name="conv_in")(z)
        h = VAEResnetBlock(ch, norm_axis=self.norm_axis, dtype=self.dtype, name="mid_block_1")(h, tile_weight)
        h = VAEAttnBlock(norm_axis=self.norm_axis, dtype=self.dtype, name="mid_attn_1")(h, tile_weight)
        h = VAEResnetBlock(ch, norm_axis=self.norm_axis, dtype=self.dtype, name="mid_block_2")(h, tile_weight)
        for rlevel, mult in enumerate(reversed(cfg.ch_mult)):
            level = len(cfg.ch_mult) - 1 - rlevel
            ch = cfg.ch * mult
            for i in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(ch, norm_axis=self.norm_axis, dtype=self.dtype, name=f"up_{level}_block_{i}")(h, tile_weight)
            if level != 0:
                n, hh, ww, cc = h.shape
                h = h[:, :, None, :, None, :]
                h = jnp.broadcast_to(h, (n, hh, 2, ww, 2, cc)).reshape(n, 2 * hh, 2 * ww, cc)
                h = Conv(ch, 3, dtype=self.dtype, name=f"up_{level}_upsample")(h)
        h = GroupNorm32(eps=1e-6, axis_name=self.norm_axis, fuse_silu=True, dtype=self.dtype, name="norm_out")(h, tile_weight)
        return Conv(cfg.out_channels, 3, dtype=self.dtype, name="conv_out")(h)


class DiagonalGaussian:
    """Moments [B,H,W,2C] -> mean/logvar; sample or mode.

    (reference sgm/modules/distributions/distributions.py:24-73)
    """

    def __init__(self, moments: jnp.ndarray):
        self.mean, logvar = jnp.split(moments, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng):
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self):
        return self.mean

    def kl(self):
        return 0.5 * jnp.sum(
            self.mean**2 + self.var - 1.0 - self.logvar, axis=(1, 2, 3)
        )


class AutoencoderKL(nn.Module):
    """VAE with quant/post_quant 1x1 convs and — for SUPIR — an extra
    `denoise_encoder` parameter branch (deep-copied encoder in the reference,
    SUPIR_model.py:17; here simply a second submodule filled by the
    checkpoint converter)."""

    cfg: VAEConfig
    with_denoise_encoder: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = VAEEncoder(self.cfg, dtype=self.dtype)
        self.decoder = VAEDecoder(self.cfg, dtype=self.dtype)
        factor = 2 if self.cfg.double_z else 1
        self.quant_conv = Conv(factor * self.cfg.embed_dim, 1, dtype=self.dtype)
        self.post_quant_conv = Conv(self.cfg.z_channels, 1, dtype=self.dtype)
        if self.with_denoise_encoder:
            self.denoise_encoder = VAEEncoder(self.cfg, dtype=self.dtype)

    def moments(self, x, use_denoise_encoder=False):
        enc = self.denoise_encoder if use_denoise_encoder else self.encoder
        return self.quant_conv(enc(x))

    def encode_mode(self, x, use_denoise_encoder=False):
        return DiagonalGaussian(self.moments(x, use_denoise_encoder)).mode()

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        """Full roundtrip (mode latent), used for init/shape checks.

        Touches every parameter branch (incl. denoise_encoder) so that
        `init` materializes the complete tree."""
        z = self.encode_mode(x)
        if self.with_denoise_encoder:
            z = z + 0.0 * self.encode_mode(x, use_denoise_encoder=True)
        return self.decode(z)
