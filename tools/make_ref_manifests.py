"""Generate key manifests (name -> shape) of the REAL checkpoint key space by
instantiating the reference's own torch modules on the meta device.

The reference modules (`/root/reference`) are the code that produced/loads
`sd_xl_base_1.0_0.9vae.safetensors` and `SUPIR-v0Q.ckpt`, so their
`state_dict()` key space IS the checkpoint contract (`SUPIR/util.py:34-51`
loads with strict=False into exactly this tree). Converter rules are tested
against these manifests (tests/test_ckpt_manifest.py) so a misspelled torch
key can no longer pass.

Run:  python tools/make_ref_manifests.py  (writes supir_tpu/data/*.json)

Heavy imports (pytorch_lightning, omegaconf, open_clip, xformers, kornia,
torchvision) are stubbed — we only need module __init__ graphs, on meta.
"""

from __future__ import annotations

import json
import os
import sys
import types


def _stub(name, **attrs):
    import importlib.machinery

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs():
    import torch

    _stub("pytorch_lightning", LightningModule=torch.nn.Module, Callback=object,
          Trainer=object, seed_everything=lambda *a, **k: None)
    _stub("pytorch_lightning.callbacks", Callback=object)
    _stub("pytorch_lightning.utilities", rank_zero_only=lambda f: f)

    class _DictConfig(dict):
        pass

    _stub("omegaconf", OmegaConf=object, ListConfig=list, DictConfig=_DictConfig)
    _stub("omegaconf.listconfig", ListConfig=list)
    _stub("kornia")
    _stub("k_diffusion")
    _stub("k_diffusion.sampling", get_sigmas_karras=None, BrownianTreeNoiseSampler=None)
    oc = _stub("open_clip")
    oc.create_model_and_transforms = None
    tv = _stub("torchvision")
    _stub("torchvision.transforms", Compose=object, Resize=object, ToTensor=object,
          Normalize=object, CenterCrop=object)
    tv.transforms = sys.modules["torchvision.transforms"]
    _stub("torchvision.models", vgg16=None)


def manifest_of(module, prefix: str) -> dict:
    return {
        prefix + k: list(v.shape)
        for k, v in module.state_dict().items()
    }


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch

    out = {}

    with torch.device("meta"):
        # ---- UNet + control (options/SUPIR_v0.yaml:43-108 params) ----
        from SUPIR.modules.SUPIR_v0 import GLVControl, LightGLVUNet

        unet_kwargs = dict(
            adm_in_channels=2816,
            num_classes="sequential",
            use_checkpoint=True,
            in_channels=4,
            out_channels=4,
            model_channels=320,
            attention_resolutions=[4, 2],
            num_res_blocks=2,
            channel_mult=[1, 2, 4],
            num_head_channels=64,
            use_spatial_transformer=True,
            use_linear_in_transformer=True,
            transformer_depth=[1, 2, 10],
            context_dim=2048,
            spatial_transformer_attn_type="softmax",  # avoid xformers
            legacy=False,
        )
        unet = LightGLVUNet(
            mode="XL-base", project_type="ZeroSFT",
            project_channel_scale=2, **unet_kwargs,
        )
        out["unet"] = manifest_of(unet, "model.diffusion_model.")

        ctrl = GLVControl(**unet_kwargs, input_upscale=1)
        out["control"] = manifest_of(ctrl, "model.control_model.")

        # ---- VAE (options/SUPIR_v0.yaml:110-139) ----
        from sgm.modules.diffusionmodules.model import Encoder, Decoder

        ddconfig = dict(
            attn_type="vanilla",  # same param names as vanilla-xformers
            double_z=True, z_channels=4, resolution=256, in_channels=3,
            out_ch=3, ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2,
            attn_resolutions=[], dropout=0.0,
        )
        enc = Encoder(**ddconfig)
        dec = Decoder(**ddconfig)
        vae = {}
        vae.update(manifest_of(enc, "first_stage_model.encoder."))
        vae.update(manifest_of(enc, "first_stage_model.denoise_encoder."))
        vae.update(manifest_of(dec, "first_stage_model.decoder."))
        qc = torch.nn.Conv2d(8, 8, 1)
        pqc = torch.nn.Conv2d(4, 4, 1)
        vae.update(manifest_of(qc, "first_stage_model.quant_conv."))
        vae.update(manifest_of(pqc, "first_stage_model.post_quant_conv."))
        out["vae"] = vae

        # ---- CLIP-L text tower (HF transformers; config == ViT-L/14) ----
        from transformers import CLIPTextConfig, CLIPTextModel

        # openai/clip-vit-large-patch14 text tower
        clip_l = CLIPTextModel(CLIPTextConfig(
            hidden_size=768, intermediate_size=3072, num_attention_heads=12,
            num_hidden_layers=12, projection_dim=768,
        ))
        out["clip_l"] = manifest_of(clip_l, "conditioner.embedders.0.transformer.")

    # ---- OpenCLIP bigG text tower ----
    # open_clip is not installed; its text transformer is plain torch
    # (nn.MultiheadAttention resblocks), so reconstruct the exact module
    # tree from open_clip's documented layergen: width 1280, layers 32,
    # heads 20, vocab 49408, ctx 77 (ViT-bigG-14 text config).
    import torch.nn as nn

    with torch.device("meta"):
        width, layers, vocab, ctx = 1280, 32, 49408, 77

        class _RB(nn.Module):
            def __init__(self):
                super().__init__()
                self.ln_1 = nn.LayerNorm(width)
                self.attn = nn.MultiheadAttention(width, 20)
                self.ln_2 = nn.LayerNorm(width)
                self.mlp = nn.Sequential()
                self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
                self.mlp.add_module("gelu", nn.GELU())
                self.mlp.add_module("c_proj", nn.Linear(width * 4, width))

        class _TxT(nn.Module):
            def __init__(self):
                super().__init__()
                self.token_embedding = nn.Embedding(vocab, width)
                self.positional_embedding = nn.Parameter(torch.empty(ctx, width))
                self.transformer = nn.Module()
                self.transformer.resblocks = nn.ModuleList([_RB() for _ in range(layers)])
                self.ln_final = nn.LayerNorm(width)
                self.text_projection = nn.Parameter(torch.empty(width, width))
                self.attn_mask = nn.Parameter(torch.empty(ctx, ctx))  # buffer in open_clip

        bigg = _TxT()
        man = manifest_of(bigg, "conditioner.embedders.1.model.")
        man.pop("conditioner.embedders.1.model.attn_mask", None)
        out["clip_bigg"] = man

    # ---- LLaVA-v1.5-13b (reference llava/model/llava_llama.py tree:
    # HF LlamaForCausalLM + model.vision_tower.vision_tower = CLIPVisionModel
    # (ViT-L/14-336) + model.mm_projector = mlp2x_gelu) ----
    with torch.device("meta"):
        from transformers import (
            CLIPVisionConfig as HFCLIPVisionConfig,
            CLIPVisionModel,
            LlamaConfig as HFLlamaConfig,
            LlamaForCausalLM,
        )

        lcfg = HFLlamaConfig(
            vocab_size=32000, hidden_size=5120, intermediate_size=13824,
            num_hidden_layers=40, num_attention_heads=40,
            max_position_embeddings=2048,
        )
        llama = LlamaForCausalLM(lcfg)
        llava = manifest_of(llama, "")
        vcfg = HFCLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=336, patch_size=14,
            projection_dim=768,
        )
        vision = CLIPVisionModel(vcfg)
        llava.update(manifest_of(vision, "model.vision_tower.vision_tower."))
        proj0 = torch.nn.Linear(1024, 5120)
        proj2 = torch.nn.Linear(5120, 5120)
        llava.update(manifest_of(proj0, "model.mm_projector.0."))
        llava.update(manifest_of(proj2, "model.mm_projector.2."))
        out["llava"] = llava

    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "supir_tpu", "data"),
                exist_ok=True)
    dst = os.path.join(os.path.dirname(__file__), "..", "supir_tpu", "data",
                       "ref_key_manifests.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    total = sum(len(v) for v in out.values())
    print(f"wrote {dst}: " + ", ".join(f"{k}={len(v)}" for k, v in out.items())
          + f" (total {total} keys)")


if __name__ == "__main__":
    main()
