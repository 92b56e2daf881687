"""Typed configuration tree.

Replaces the reference's string-reflection OmegaConf DI (`sgm/util.py:168-185`
+ `options/*.yaml`) with frozen dataclasses. A thin YAML loader keeps the
`options/*.yaml` surface for users coming from the reference repo.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SDXL-base UNet (reference options/SUPIR_v0.yaml:43-64)."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2)
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    num_head_channels: int = 64
    transformer_depth: Tuple[int, ...] = (1, 2, 10)
    transformer_depth_middle: Optional[int] = None
    context_dim: int = 2048
    adm_in_channels: Optional[int] = 2816
    dropout: float = 0.0

    def tiny(self) -> "UNetConfig":
        """Scaled-down config for tests (keeps the wiring, shrinks widths)."""
        return dataclasses.replace(
            self,
            model_channels=32,
            num_head_channels=16,
            transformer_depth=(1, 1, 2),
            context_dim=64,
            adm_in_channels=96,
        )

    @property
    def levels(self) -> int:
        return len(self.channel_mult)

    @property
    def middle_depth(self) -> int:
        return (
            self.transformer_depth_middle
            if self.transformer_depth_middle is not None
            else self.transformer_depth[-1]
        )


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL f8/z4 (reference options/SUPIR_v0.yaml:107-125)."""

    in_channels: int = 3
    out_channels: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    embed_dim: int = 4

    def tiny(self) -> "VAEConfig":
        return dataclasses.replace(self, ch=32)

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


@dataclasses.dataclass(frozen=True)
class ControlConfig:
    """GLVControl/LightGLVUNet wiring (reference SUPIR_v0.py:543-580).

    mode tables are the checkpoint contract; XL-base values below.
    """

    mode: str = "XL-base"
    project_type: str = "ZeroSFT"
    project_channel_scale: float = 2.0
    input_upscale: int = 1

    @property
    def cond_output_channels(self) -> Tuple[int, ...]:
        if self.mode == "XL-base":
            return tuple([320] * 4 + [640] * 3 + [1280] * 3)
        if self.mode == "XL-refine":
            return tuple([384] * 4 + [768] * 3 + [1536] * 6)
        raise NotImplementedError(self.mode)

    @property
    def project_channels(self) -> Tuple[int, ...]:
        if self.mode == "XL-base":
            base = [160] * 4 + [320] * 3 + [640] * 3
        elif self.mode == "XL-refine":
            base = [192] * 4 + [384] * 3 + [768] * 6
        else:
            raise NotImplementedError(self.mode)
        return tuple(int(c * self.project_channel_scale) for c in base)

    @property
    def concat_channels(self) -> Tuple[int, ...]:
        if self.mode == "XL-base":
            return tuple([320] * 2 + [640] * 3 + [1280] * 4 + [0])
        if self.mode == "XL-refine":
            return tuple([384] * 2 + [768] * 3 + [1536] * 7 + [0])
        raise NotImplementedError(self.mode)

    @property
    def cross_attn_insert_idx(self) -> Tuple[int, ...]:
        return (6, 3) if self.mode == "XL-base" else (9, 6, 3)

    def scaled_for(self, unet: UNetConfig) -> "ControlConfig":
        """Tables scaled to a (tiny) UNet width for tests."""
        return _ScaledControlConfig(unet=unet, base=self)


@dataclasses.dataclass(frozen=True)
class _ScaledControlConfig(ControlConfig):
    unet: UNetConfig = None
    base: ControlConfig = None

    def _scale(self, vals):
        # base channel of the mode table (320 for XL-base, 384 for XL-refine)
        r = self.unet.model_channels / float(self.base.cond_output_channels[0])
        return tuple(int(v * r) for v in vals)

    @property
    def cond_output_channels(self):
        return self._scale(self.base.cond_output_channels)

    @property
    def project_channels(self):
        return self._scale(self.base.project_channels)

    @property
    def concat_channels(self):
        return self._scale(self.base.concat_channels)

    @property
    def cross_attn_insert_idx(self):
        return self.base.cross_attn_insert_idx


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    name: str = "RestoreEDM"  # RestoreEDM | RestoreDPMPP2M | TiledRestoreEDM | ...
    num_steps: int = 50
    restore_cfg: float = 4.0
    restore_cfg_s_tmin: float = 0.05
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_noise: float = 1.003
    eta: float = 1.0
    cfg_scale: float = 7.5
    cfg_scale_min: float = 4.0
    use_linear_cfg: bool = True
    tile_size: int = 128
    tile_stride: int = 64


@dataclasses.dataclass(frozen=True)
class SUPIRConfig:
    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    control: ControlConfig = ControlConfig()
    sampler: SamplerConfig = SamplerConfig()
    scale_factor: float = 0.13025
    num_idx: int = 1000
    ae_dtype: str = "bf16"
    diffusion_dtype: str = "bf16"  # fp16 is a CUDA artifact; bf16 on TPU
    p_p: str = (
        "Cinematic, High Contrast, highly detailed, taken using a Canon EOS R "
        "camera, hyper detailed photo - realistic maximum detail, 32k, Color "
        "Grading, ultra HD, extreme meticulous detailing, skin pore detailing, "
        "hyper sharpness, perfect without deformations."
    )
    n_p: str = (
        "painting, oil painting, illustration, drawing, art, sketch, oil "
        "painting, cartoon, CG Style, 3D render, unreal engine, blurring, "
        "dirty, messy, worst quality, low quality, frames, watermark, "
        "signature, jpeg artifacts, deformed, lowres, over-smooth"
    )

    @classmethod
    def tiny(cls) -> "SUPIRConfig":
        unet = UNetConfig().tiny()
        return cls(
            unet=unet,
            vae=VAEConfig().tiny(),
            control=ControlConfig().scaled_for(unet),
        )


def dtype_of(name: str):
    import jax.numpy as jnp

    return {"fp32": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.float16}[name]


# ---------------------------------------------------------------------------
# YAML surface (options/*.yaml)


def _merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def load_yaml_config(path: str):
    """Load an options/*.yaml into (SUPIRConfig, extras dict).

    Supports a simple `include:` key for layering (tiled / lightning
    variants extend the base file). Extras carry checkpoint paths,
    default_setting, and tile_vae sizes.
    """
    import os

    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    if "include" in raw:
        base_path = os.path.join(os.path.dirname(path), raw.pop("include"))
        with open(base_path) as f:
            base = yaml.safe_load(f)
        base.pop("include", None)
        raw = _merge(base, raw)

    m = raw.get("model", {})

    def build(cls, key, **extra):
        kwargs = dict(m.get(key, {}))
        kwargs.update(extra)
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in kwargs.items()
            if k in fields
        }
        return cls(**kwargs)

    unet = build(UNetConfig, "unet")
    cfg = SUPIRConfig(
        unet=unet,
        vae=build(VAEConfig, "vae"),
        control=build(ControlConfig, "control"),
        sampler=build(SamplerConfig, "sampler"),
        scale_factor=m.get("scale_factor", 0.13025),
        ae_dtype=m.get("ae_dtype", "bf16"),
        diffusion_dtype=m.get("diffusion_dtype", "bf16"),
        p_p=raw.get("p_p", SUPIRConfig.p_p),
        n_p=raw.get("n_p", SUPIRConfig.n_p),
    )
    extras = {
        k: raw.get(k)
        for k in ("SDXL_CKPT", "SUPIR_CKPT_Q", "SUPIR_CKPT_F", "default_setting", "tile_vae")
    }
    return cfg, extras
