"""Oracle harness: drive the reference's OWN torch modules at tiny width.

The strongest offline parity proof available: instantiate the reference's
`SUPIR_v0.GLVControl` / `LightGLVUNet`, sgm's VAE `Encoder`/`Decoder`,
`DiscreteDenoiserWithControl` and `RestoreEDMSampler` (the exact code that
loads the released checkpoints), randomize their parameters, push the torch
`state_dict()` through our converter, and assert our JAX forward reproduces
the torch forward with real CPU tensors.

Heavy GPU-only deps (xformers, pytorch_lightning, omegaconf, kornia,
k_diffusion, open_clip, torchvision) are stubbed exactly as in
`tools/make_ref_manifests.py` — the reference degrades to plain-torch
softmax attention paths on CPU (`sgm/modules/attention.py:397-410`,
`sgm/modules/diffusionmodules/model.py:283-296`).

Tiny widths: the reference's `LightGLVUNet.__init__` hardcodes the XL-base
channel tables (`SUPIR_v0.py:547-551`); we intercept the two adaptor
constructors and scale their channel args by model_channels/320, which is
exactly what our `ControlConfig.scaled_for` does on the JAX side.
"""

from __future__ import annotations

import contextlib
import sys

import numpy as np

REF = "/root/reference"

# tiny width mirroring SUPIRConfig.tiny() (supir_tpu/config.py:31-40)
TINY_UNET_KW = dict(
    adm_in_channels=96,
    num_classes="sequential",
    use_checkpoint=False,
    in_channels=4,
    out_channels=4,
    model_channels=32,
    attention_resolutions=[4, 2],
    num_res_blocks=2,
    channel_mult=[1, 2, 4],
    num_head_channels=16,
    use_spatial_transformer=True,
    use_linear_in_transformer=True,
    transformer_depth=[1, 1, 2],
    context_dim=64,
    spatial_transformer_attn_type="softmax",  # CPU path, no xformers
    legacy=False,
)

_loaded = {}


def load_ref():
    """Install stubs, put the reference on sys.path, import its modules.

    Returns a namespace dict of the reference modules we drive."""
    if _loaded:
        return _loaded
    sys.path.insert(0, "/root/repo")
    from tools.make_ref_manifests import install_stubs

    install_stubs()
    _fix_kdiff_stub()
    _fix_engine_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import SUPIR.modules.SUPIR_v0 as supir_v0
    import sgm.modules.diffusionmodules.model as vae_model
    import sgm.modules.diffusionmodules.denoiser as denoiser
    import sgm.modules.diffusionmodules.sampling as sampling

    _loaded.update(
        supir_v0=supir_v0, vae_model=vae_model, denoiser=denoiser,
        sampling=sampling,
    )
    return _loaded


def _fix_engine_stubs():
    """Extra stub surface needed only by the ENGINE import chain
    (`SUPIR/models/SUPIR_model.py` -> colorfix -> torchvision transforms,
    tilevae -> diffusers): the module-level goldens never touch these."""
    import types

    sys.modules["torchvision.transforms"].ToPILImage = object
    for name in ("diffusers", "diffusers.utils", "diffusers.utils.import_utils"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["diffusers.utils.import_utils"].is_xformers_available = (
        lambda: False
    )


class RefCfg(dict):
    """instantiate_from_config wants `cfg["target"]`/`cfg.get("params")`;
    SUPIRModel.batchify_sample mutates `sampler_config.params.num_steps`
    (SUPIR_model.py:101-111) — a dict with attribute access serves both."""

    def __getattr__(self, k):
        return self[k]

    def __setattr__(self, k, v):
        self[k] = v


def ref_cfg(target: str, **params) -> RefCfg:
    return RefCfg(target=target, params=RefCfg(**params))


def build_tiny_supir_model(num_steps=3, tiled=False, tile_size=8,
                           tile_stride=4):
    """The reference's OWN `SUPIRModel` (SUPIR_model.py:12-41) at tiny width:
    full DiffusionEngine graph (ControlWrapper'd LightGLVUNet + GLVControl,
    DiscreteDenoiserWithControl, AutoencoderKLInferenceWrapper first stage
    with the deep-copied denoise_encoder, RestoreEDMSampler + LinearCFG),
    randomized zero-init params. tiled=True swaps in the reference's
    TiledRestoreEDMSampler (sampling.py:600-660, latent-unit tiles)."""
    ref = load_ref()
    import torch

    sys.path.insert(0, REF)
    from SUPIR.models.SUPIR_model import SUPIRModel

    disc = "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"
    ddconfig = dict(
        attn_type="vanilla", double_z=True, z_channels=4, resolution=64,
        in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2, 4, 4],
        num_res_blocks=2, attn_resolutions=[], dropout=0.0,
    )
    torch.manual_seed(5)
    with scaled_adapters(ref["supir_v0"], TINY_UNET_KW["model_channels"] / 320):
        m = SUPIRModel(
            control_stage_config=ref_cfg(
                "SUPIR.modules.SUPIR_v0.GLVControl", input_upscale=1,
                **TINY_UNET_KW,
            ),
            ae_dtype="fp32",
            diffusion_dtype="fp32",
            network_config=ref_cfg(
                "SUPIR.modules.SUPIR_v0.LightGLVUNet", mode="XL-base",
                project_type="ZeroSFT", project_channel_scale=2,
                **TINY_UNET_KW,
            ),
            denoiser_config=ref_cfg(
                "sgm.modules.diffusionmodules.denoiser.DiscreteDenoiserWithControl",
                num_idx=1000,
                weighting_config=ref_cfg(
                    "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"
                ),
                scaling_config=ref_cfg(
                    "sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling"
                ),
                discretization_config=ref_cfg(disc),
            ),
            first_stage_config=ref_cfg(
                "sgm.models.autoencoder.AutoencoderKLInferenceWrapper",
                embed_dim=4, monitor="val/rec_loss", ddconfig=ddconfig,
                lossconfig=ref_cfg("torch.nn.Identity"),
            ),
            sampler_config=ref_cfg(
                "sgm.modules.diffusionmodules.sampling."
                + ("TiledRestoreEDMSampler" if tiled else "RestoreEDMSampler"),
                num_steps=num_steps, restore_cfg=4.0, s_churn=0.0,
                s_noise=1.003, device="cpu",
                discretization_config=ref_cfg(disc),
                guider_config=ref_cfg(
                    "sgm.modules.diffusionmodules.guiders.LinearCFG",
                    scale=7.5, scale_min=4.0,
                ),
                **(dict(tile_size=tile_size, tile_stride=tile_stride)
                   if tiled else {}),
            ),
            network_wrapper="sgm.modules.diffusionmodules.wrappers.ControlWrapper",
            scale_factor=0.13025,
            disable_first_stage_autocast=True,
        )
    m.eval()
    randomize_zero_params(m)
    return m


def _fix_kdiff_stub():
    """make_ref_manifests stubs k_diffusion symbols as None (import-only).
    For driving samplers we need a real `get_sigmas_karras` (the public
    5-line rho=7 ramp, k-diffusion sampling.py) and a zero-noise
    BrownianTreeNoiseSampler so eta=0 DPM++ paths are exact."""
    import torch

    kd = sys.modules.get("k_diffusion.sampling")
    if kd is None:
        return

    def get_sigmas_karras(n, sigma_min, sigma_max, rho=7.0, device="cpu"):
        ramp = torch.linspace(0, 1, n)
        min_inv_rho = float(sigma_min) ** (1 / rho)
        max_inv_rho = float(sigma_max) ** (1 / rho)
        sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
        return torch.cat([sigmas, sigmas.new_zeros([1])]).to(device)

    class ZeroBrownianTree:
        def __init__(self, x, sigma_min, sigma_max, seed=None, **kw):
            self.shape = x.shape
            self.dtype = x.dtype

        def __call__(self, sigma, sigma_next):
            import torch as _t

            return _t.zeros(self.shape, dtype=self.dtype)

    kd.get_sigmas_karras = get_sigmas_karras
    kd.BrownianTreeNoiseSampler = ZeroBrownianTree


@contextlib.contextmanager
def scaled_adapters(supir_v0, r: float):
    """Scale the hardcoded XL-base adaptor channel tables by r (=32/320)."""
    sft, xattn = supir_v0.ZeroSFT, supir_v0.ZeroCrossAttn

    def mk_sft(label_nc, norm_nc, concat_channels=0, **kw):
        return sft(int(label_nc * r), int(norm_nc * r),
                   concat_channels=int(concat_channels * r), **kw)

    def mk_xattn(context_dim, query_dim, **kw):
        return xattn(int(context_dim * r), int(query_dim * r), **kw)

    supir_v0.ZeroSFT, supir_v0.ZeroCrossAttn = mk_sft, mk_xattn
    try:
        yield
    finally:
        supir_v0.ZeroSFT, supir_v0.ZeroCrossAttn = sft, xattn


def build_tiny_control():
    ref = load_ref()
    import torch

    torch.manual_seed(7)
    m = ref["supir_v0"].GLVControl(**TINY_UNET_KW, input_upscale=1)
    randomize_zero_params(m)
    return m.eval()


def build_tiny_unet():
    ref = load_ref()
    import torch

    torch.manual_seed(11)
    with scaled_adapters(ref["supir_v0"], TINY_UNET_KW["model_channels"] / 320):
        m = ref["supir_v0"].LightGLVUNet(
            mode="XL-base", project_type="ZeroSFT", project_channel_scale=2,
            **TINY_UNET_KW,
        )
    randomize_zero_params(m)
    return m.eval()


def build_tiny_vae():
    """Reference Encoder/Decoder + quant convs at ch=32 (VAEConfig.tiny)."""
    ref = load_ref()
    import torch

    torch.manual_seed(13)
    ddconfig = dict(
        attn_type="vanilla", double_z=True, z_channels=4, resolution=64,
        in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2, 4, 4],
        num_res_blocks=2, attn_resolutions=[], dropout=0.0,
    )
    enc = ref["vae_model"].Encoder(**ddconfig).eval()
    dec = ref["vae_model"].Decoder(**ddconfig).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    return enc, dec, quant, post_quant


def randomize_zero_params(module, scale=0.2, seed=3):
    """zero_module()-initialized convs (hint conv, ZeroSFT mul/add/conv,
    ResBlock out, transformer proj_out, final out) and norm biases make the
    default-init forward degenerate (output literally 0); fill every
    all-zero parameter with small noise so parity actually exercises them."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn(p.shape, generator=g) * scale)


def state_dict_np(module, prefix: str):
    return {prefix + k: v.detach().cpu().numpy()
            for k, v in module.state_dict().items()}


def nhwc(x) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(_np(x), (0, 2, 3, 1)))


def nchw(x) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(x), (0, 3, 1, 2)))


def _np(x):
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)
