"""Shared NN building blocks (flax.linen, NHWC, explicit dtype policy).

Behavioral contracts come from the reference building blocks
(`sgm/modules/diffusionmodules/util.py`): GroupNorm over 32 groups,
sinusoidal timestep embeddings with cos-then-sin ordering, zero-initialized
output projections. Design is TPU-first: NHWC layout (channel minor, so
convs lower to MXU-friendly matmuls), bf16 compute with fp32 params, and
normalization statistics always accumulated in fp32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

zeros_init = nn.initializers.zeros


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal embeddings, [N] -> [N, dim]; cos first, then sin
    (reference `timestep_embedding`, util.py:206-230)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm with 32 groups, fp32 statistics, cast back to input dtype.

    eps defaults to the UNet convention (1e-5); the VAE uses 1e-6.

    `fuse_silu`: apply SiLU inside the norm (lets XLA fuse the pair; can
    optionally lower to the Pallas kernel in supir_tpu.ops.groupnorm via
    `enable_pallas_gn` — measured faster standalone but slower inside the
    full UNet where it blocks XLA fusion, so it is off by default).

    `axis_name`: when set, normalization statistics are pooled across that
    named axis (vmap/shard_map) — the TPU-native form of the reference
    tiled-VAE's cross-tile GroupNorm pooling (SUPIR/utils/tilevae.py:
    599-648): per-tile mean/var become a collective pmean over the 'tile'
    axis.

    Cross-chunk exact statistics (tiled VAE, parallel/tiled_vae.py):
      - if a "gn_tape" collection provides a "tape" entry for this module
        (stack([mean, mean2]) fp32 [2, B, G]), normalization uses THOSE
        statistics and skips the local reduction — the mechanism behind the
        tiled VAE's staged-exact execution, which reproduces the
        reference's exact global pooling (tilevae.py:599-648) without its
        host-RAM task queue;
      - `tile_weight` (scalar, from a vmapped per-tile array) weights this
        tile's contribution to the cross-axis pmean so padded duplicate
        tiles (tile-axis rounding) carry zero weight: pmean(w_i * m_i) with
        mean(w) == 1 over the axis is the exact all-real-tiles mean.
    """

    eps: float = 1e-5
    num_groups: int = 32
    axis_name: Any = None
    fuse_silu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, tile_weight=None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        from supir_tpu.ops import groupnorm as gn_ops

        use_pallas = (
            gn_ops.PALLAS_GN_ENABLED
            and self.axis_name is None
            and jax.default_backend() == "tpu"
            and not self.is_initializing()
            and c % self.num_groups == 0
        )
        if use_pallas:
            from supir_tpu.ops.groupnorm import group_norm_silu

            out = group_norm_silu(
                x, scale, bias, groups=self.num_groups, eps=self.eps,
                apply_silu=self.fuse_silu,
            )
            return out.astype(self.dtype)

        # Streaming GN: stats accumulate in fp32 *inside* the reductions
        # (XLA fuses the convert+square into the reduce — no fp32 copy of
        # the activation is ever materialized), then the normalization is a
        # single per-channel FMA in the compute dtype. This is the torch-
        # autocast semantic (fp32 stats, low-precision IO) at half the HBM
        # traffic of an upcast-normalize-downcast chain.
        g = self.num_groups
        cg = c // g
        b = x.shape[0]
        import os

        if os.environ.get("SUPIR_GN_BARRIER") == "1":
            # A/B knob: stop XLA from fusing the stat reduces into the
            # producing conv. Trace evidence: convs with GN stats fused in
            # run at 67-73 TF/s vs ~161 clean — but the separated-stats
            # variant MEASURED SLOWER end-to-end (182.0 vs 175.3 ms/step on
            # v5e): the extra activation read outweighs the conv slowdown.
            # Kept as an off-by-default knob for future hardware.
            x = jax.lax.optimization_barrier(x)
        xg = x.reshape(b, -1, g, cg)
        # NOTE: a single variadic lax.reduce for (mean, mean2) was tried and
        # measured SLOWER e2e (185.9 vs 176.3 ms/step): XLA's reduce-fusion
        # idioms around two sibling jnp.means beat the variadic form.
        # (An MXU self-dot for sum(x^2) was tried to dodge the fp32-upcast
        # CSE at the big sites; XLA canonicalizes it back to multiply+reduce
        # — bit-identical binary. The two-mean form stays.)
        if self.has_variable("gn_tape", "tape"):
            # externally supplied global statistics (tiled-VAE staged-exact
            # execution): skip the local reduction entirely
            tape = self.get_variable("gn_tape", "tape")
            if isinstance(tape, (tuple, list)):
                tape = tape[0]
            mean, mean2 = tape[0], tape[1]
        else:
            mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)
            mean2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 3))
            if self.axis_name is not None:
                if tile_weight is not None:
                    w = jnp.asarray(tile_weight, jnp.float32)
                    mean = jax.lax.pmean(mean * w, self.axis_name)
                    mean2 = jax.lax.pmean(mean2 * w, self.axis_name)
                else:
                    mean = jax.lax.pmean(mean, self.axis_name)
                    mean2 = jax.lax.pmean(mean2, self.axis_name)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        rstd = jax.lax.rsqrt(var + self.eps)
        # fold mean/rstd/affine into one y = x*a + b epilogue, per channel
        a_g = rstd  # [b, g]
        a_c = jnp.repeat(a_g, cg, axis=-1) * scale[None]            # [b, c]
        b_c = bias[None] - jnp.repeat(mean * rstd, cg, axis=-1) * scale[None]
        y = x * a_c[:, None, None, :].astype(x.dtype) + b_c[:, None, None, :].astype(x.dtype) \
            if x.ndim == 4 else x * a_c[:, None, :].astype(x.dtype) + b_c[:, None, :].astype(x.dtype)
        if self.fuse_silu:
            y = nn.silu(y)
        return y.astype(self.dtype)


class FusedLayerNorm(nn.Module):
    """LayerNorm with streaming fp32 statistics and a single low-precision
    elementwise pass (flax's LayerNorm materializes an fp32 copy of the
    activation first — measurable HBM overhead at transformer-token sizes).
    Param layout matches flax LayerNorm (scale/bias at module root), so the
    checkpoint converter is unaffected."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        var = jnp.maximum(m2 - mean * mean, 0.0)
        rstd = jax.lax.rsqrt(var + self.eps)
        y = (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)
        return (y * scale.astype(x.dtype) + bias.astype(x.dtype)).astype(self.dtype)


class Conv(nn.Module):
    """3x3/1x1 conv, NHWC."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: Any = None  # default: SAME-style symmetric padding of kernel//2
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if pad is None:
            p = self.kernel // 2
            pad = [(p, p), (p, p)]
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=zeros_init if self.zero_init else nn.initializers.lecun_normal(),
            bias_init=zeros_init,
        )(x)


class Dense(nn.Module):
    features: int
    zero_init: bool = False
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=zeros_init if self.zero_init else nn.initializers.lecun_normal(),
            bias_init=zeros_init,
        )(x)


class TimestepEmbedMLP(nn.Module):
    """Linear -> SiLU -> Linear (time_embed / label_emb head)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Dense(self.features, dtype=self.dtype, name="fc1")(x)
        x = nn.silu(x)
        x = Dense(self.features, dtype=self.dtype, name="fc2")(x)
        return x


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample, NHWC."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
