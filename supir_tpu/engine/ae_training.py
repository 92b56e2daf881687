"""Autoencoder (first-stage) adversarial training — the TPU re-expression of
the reference's `AutoencodingEngine.training_step`
(sgm/models/autoencoder.py:182-215) with
`GeneralLPIPSWithDiscriminator` (sgm/modules/autoencoding/losses/__init__.py):

  optimizer 0 (generator):     L1 rec (+ LPIPS) + kl_weight*KL
                               + d_weight * disc_weight * g_loss
  optimizer 1 (discriminator): hinge(real, fake), gated by disc_start

where d_weight is the ADAPTIVE balance — the ratio of the reconstruction
loss's gradient norm to the adversarial loss's gradient norm, both taken at
the decoder's last conv kernel (losses/__init__.py:137-152) — so the GAN
term never overwhelms reconstruction regardless of scale.

This is how SUPIR's degradation-robust `denoise_encoder` (stage 1) is
produced: `train_branch="denoise_encoder"` optimizes ONLY that branch (LQ
in, HQ target, frozen decoder), mirroring the paper's recipe of fine-tuning
a copy of the encoder on degraded inputs while the rest of the autoencoder
stays fixed (SUPIR_model.py:17 carries the resulting second encoder).

TPU shape: one jitted step runs BOTH phases back to back (no
optimizer_idx ping-pong across host calls — each phase's grads are computed
in-graph and both optax states advance once), params FSDP-shardable with
`parallel.sharding.fsdp_param_shardings`, bf16-compute-ready through the
module dtype.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from supir_tpu.diffusion.ae_losses import (
    AELossConfig,
    NLayerDiscriminator,
    discriminator_loss,
)
from supir_tpu.models.vae import AutoencoderKL, DiagonalGaussian


class AETrainer:
    """Two-phase adversarial trainer for AutoencoderKL.

    train_branch: "all" trains the full generator;
    "denoise_encoder" trains only the degradation-robust encoder branch
    (quant/decoder/encoder frozen) — the stage-1 SUPIR recipe.
    """

    def __init__(
        self,
        model: AutoencoderKL,
        loss_cfg: AELossConfig = AELossConfig(),
        learning_rate: float = 4.5e-6,
        disc_lr: Optional[float] = None,
        train_branch: str = "all",
        perceptual_fn=None,
        mesh=None,
    ):
        assert train_branch in ("all", "denoise_encoder")
        self.model = model
        self.loss_cfg = loss_cfg
        self.train_branch = train_branch
        self.disc = NLayerDiscriminator()
        self.opt_g = optax.adam(learning_rate, b1=0.5, b2=0.9)
        self.opt_d = optax.adam(disc_lr or learning_rate, b1=0.5, b2=0.9)
        self.perceptual_fn = perceptual_fn
        self.mesh = mesh

    # ------------------------------------------------------------- state

    def init_state(self, gen_params, rng, image_size: int = 64) -> Dict[str, Any]:
        disc_params = self.disc.init(
            rng, jnp.zeros((1, image_size, image_size, 3))
        )["params"]
        return {
            "gen": gen_params,
            "disc": disc_params,
            "opt_g": self.opt_g.init(self._trainable(gen_params)),
            "opt_d": self.opt_d.init(disc_params),
            "step": jnp.zeros((), jnp.int32),
        }

    def _trainable(self, gen_params):
        if self.train_branch == "denoise_encoder":
            return {"denoise_encoder": gen_params["denoise_encoder"]}
        return gen_params

    def _merge(self, gen_params, trainable):
        if self.train_branch == "denoise_encoder":
            return dict(gen_params, denoise_encoder=trainable["denoise_encoder"])
        return trainable

    def shard_state(self, state):
        if self.mesh is None:
            return state
        from supir_tpu.parallel.sharding import fsdp_param_shardings

        return jax.device_put(state, fsdp_param_shardings(state, self.mesh))

    # -------------------------------------------------------------- step

    def _recon(self, gen_params, x, rng):
        use_dn = self.train_branch == "denoise_encoder"
        moments = self.model.apply(
            {"params": gen_params}, x, use_denoise_encoder=use_dn,
            method=self.model.moments,
        )
        dist = DiagonalGaussian(moments)
        z = dist.sample(rng)
        recon = self.model.apply({"params": gen_params}, z, method=self.model.decode)
        return recon, dist.mean, dist.logvar

    @functools.cached_property
    def train_step(self):
        cfg = self.loss_cfg

        def last_kernel_path(gen_params):
            # decoder's final conv kernel — the reference's `last_layer`
            # (autoencoder.py get_last_layer -> decoder.conv_out.weight)
            return gen_params["decoder"]["conv_out"]["Conv_0"]["kernel"]

        def gen_losses(trainable, frozen_gen, disc_params, x, target, rng):
            gen_params = self._merge(frozen_gen, trainable)
            recon, mean, logvar = self._recon(gen_params, x, rng)
            rec = jnp.mean(jnp.abs(recon - target))
            if self.perceptual_fn is not None:
                rec = rec + cfg.perceptual_weight * jnp.mean(
                    self.perceptual_fn(recon, target)
                )
            kl = jnp.mean(
                0.5 * jnp.sum(
                    jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar,
                    axis=(1, 2, 3),
                )
            )
            logits_fake = self.disc.apply({"params": disc_params}, recon)
            g = -jnp.mean(logits_fake)
            return rec, kl, g, recon

        def step_fn(state, x, target, rng):
            frozen_gen = state["gen"]
            trainable = self._trainable(frozen_gen)
            step = state["step"]
            rng_s, rng_d = jax.random.split(rng)

            # ---- adaptive d_weight: grad-norm ratio at the last decoder
            # kernel (losses/__init__.py:137-152). With a frozen decoder
            # (denoise_encoder branch) the ratio is ill-defined; the
            # reference requires learn_logvar-free trainable last layers
            # there too, so fall back to 1.0.
            if self.train_branch == "all":
                def by_last(k):
                    # fresh containers (same leaves), then swap the kernel in
                    gp = jax.tree_util.tree_map(lambda v: v, frozen_gen)
                    gp["decoder"]["conv_out"]["Conv_0"]["kernel"] = k
                    rec, kl, g, _ = gen_losses(
                        self._trainable(gp), gp, state["disc"], x, target, rng_s
                    )
                    return jnp.stack([rec, g])

                jac = jax.jacrev(by_last)(last_kernel_path(frozen_gen))
                nll_norm = jnp.linalg.norm(jac[0].reshape(-1))
                g_norm = jnp.linalg.norm(jac[1].reshape(-1))
                d_weight = jnp.clip(nll_norm / (g_norm + 1e-4), 0.0, 1e4)
            else:
                d_weight = jnp.float32(1.0)

            disc_on = jnp.asarray(step >= cfg.disc_start, jnp.float32)

            # ---- generator phase
            def g_total(trainable):
                rec, kl, g, recon = gen_losses(
                    trainable, frozen_gen, state["disc"], x, target, rng_s
                )
                total = rec + cfg.kl_weight * kl + \
                    d_weight * cfg.disc_weight * disc_on * g
                return total, (rec, kl, g, recon)

            (g_loss, (rec, kl, g_adv, recon)), g_grads = jax.value_and_grad(
                g_total, has_aux=True
            )(trainable)
            g_updates, opt_g = self.opt_g.update(g_grads, state["opt_g"], trainable)
            trainable = optax.apply_updates(trainable, g_updates)
            gen_params = self._merge(frozen_gen, trainable)

            # ---- discriminator phase (post-update recon, like the
            # alternating optimizer_idx loop re-encoding per phase)
            def d_total(disc_params):
                recon_d, _, _ = self._recon(gen_params, x, rng_d)
                logits_real = self.disc.apply(
                    {"params": disc_params}, target
                )
                logits_fake = self.disc.apply(
                    {"params": disc_params}, jax.lax.stop_gradient(recon_d)
                )
                return discriminator_loss(logits_real, logits_fake, step, cfg), (
                    jnp.mean(logits_real), jnp.mean(logits_fake),
                )

            (d_loss, (lr_m, lf_m)), d_grads = jax.value_and_grad(
                d_total, has_aux=True
            )(state["disc"])
            d_updates, opt_d = self.opt_d.update(d_grads, state["opt_d"], state["disc"])
            disc_params = optax.apply_updates(state["disc"], d_updates)

            new_state = {
                "gen": gen_params, "disc": disc_params,
                "opt_g": opt_g, "opt_d": opt_d, "step": step + 1,
            }
            metrics = {
                "loss_g": g_loss, "loss_d": d_loss, "rec": rec, "kl": kl,
                "g_adv": g_adv, "d_weight": d_weight,
                "logits_real": lr_m, "logits_fake": lf_m,
            }
            return new_state, metrics

        return jax.jit(step_fn, donate_argnums=(0,))
