"""Autoencoder training losses (reference sgm/modules/autoencoding/):
reconstruction + KL regularizer + perceptual (LPIPS) + patch-GAN
discriminator with adaptive weighting.

Mirrors GeneralLPIPSWithDiscriminator (autoencoding/losses/__init__.py:87)
and DiagonalGaussianRegularizer (:23): two optimization phases
(generator / discriminator) exactly like the reference's optimizer_idx.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (reference lpips/model/model.py:88)."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = self.ndf
        for i in range(1, self.n_layers + 1):
            stride = 2 if i < self.n_layers else 1
            nf = min(self.ndf * 2**i, self.ndf * 8)
            h = nn.Conv(nf, (4, 4), strides=(stride, stride), padding=1,
                        use_bias=False, name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=None, group_size=1, name=f"norm{i}")(h)  # instance-ish
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding=1, name="conv_out")(h)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real)) + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def vanilla_g_loss(logits_fake):
    return -jnp.mean(logits_fake)


def kl_regularizer(mean, logvar):
    """DiagonalGaussianRegularizer: mean KL to N(0, I) per batch."""
    var = jnp.exp(logvar)
    kl = 0.5 * jnp.sum(mean**2 + var - 1.0 - logvar, axis=(1, 2, 3))
    return jnp.mean(kl)


@dataclasses.dataclass
class AELossConfig:
    kl_weight: float = 1e-6
    disc_weight: float = 0.5
    disc_start: int = 50001
    perceptual_weight: float = 1.0


def generator_loss(
    recon, target, mean, logvar, disc_logits_fake, step, cfg: AELossConfig,
    perceptual: Optional[jnp.ndarray] = None,
):
    rec = jnp.mean(jnp.abs(recon - target))
    if perceptual is not None:
        rec = rec + cfg.perceptual_weight * jnp.mean(perceptual)
    kl = kl_regularizer(mean, logvar)
    g = vanilla_g_loss(disc_logits_fake)
    disc_on = jnp.asarray(step >= cfg.disc_start, jnp.float32)
    return rec + cfg.kl_weight * kl + cfg.disc_weight * disc_on * g, {
        "rec": rec, "kl": kl, "g": g,
    }


def discriminator_loss(logits_real, logits_fake, step, cfg: AELossConfig):
    disc_on = jnp.asarray(step >= cfg.disc_start, jnp.float32)
    return disc_on * hinge_d_loss(logits_real, logits_fake)
