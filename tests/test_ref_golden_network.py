"""Full-model torch-golden parity: the reference's OWN GLVControl +
LightGLVUNet (SUPIR_v0.py:155-666) driven at tiny width, converted through
our rules, compared against our JAX forward with real CPU tensors.

This is the system-level proof that key manifests and block goldens cannot
give: any wiring divergence (feature ordering, adaptor insertion index,
hint-add position, stop-grad boundaries don't matter for forward) shows up
as a numeric mismatch here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from supir_tpu.config import SUPIRConfig
from supir_tpu.models.control import GLVControl, LightGLVUNet
from supir_tpu.utils import ckpt as C
from tests import ref_oracle as O

torch = pytest.importorskip("torch")

CFG = SUPIRConfig.tiny()
ATOL = 3e-3  # fp32 end-to-end through ~40 layers at activation scale ~15


@pytest.fixture(scope="module")
def tiny_torch():
    ctrl_t = O.build_tiny_control()
    unet_t = O.build_tiny_unet()
    sd = O.state_dict_np(ctrl_t, "model.control_model.")
    sd.update(O.state_dict_np(unet_t, "model.diffusion_model."))
    report, used = C.ConversionReport(), set()
    params = {"unet": {}, "control": {}}
    C.apply_rules(sd, C.light_glv_unet_rules(CFG.unet, CFG.control),
                  params["unet"], report, used)
    C.apply_rules(sd, C.glv_control_rules(CFG.unet),
                  params["control"], report, used)
    assert not report.missing, report.missing[:8]
    unused = sorted(k for k in sd if k not in used)
    assert not unused, unused[:8]
    return ctrl_t, unet_t, params


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(42)
    return dict(
        x_lq=rng.standard_normal((1, 4, 16, 16)).astype(np.float32),
        xt=rng.standard_normal((1, 4, 16, 16)).astype(np.float32),
        t=np.array([500.0], np.float32),
        ctx=rng.standard_normal((1, 77, CFG.unet.context_dim)).astype(np.float32),
        y=rng.standard_normal((1, CFG.unet.adm_in_channels)).astype(np.float32),
    )


def _control_pyramid_torch(ctrl_t, inputs):
    with torch.no_grad():
        return ctrl_t(
            torch.from_numpy(inputs["x_lq"]), torch.from_numpy(inputs["t"]),
            torch.from_numpy(inputs["xt"]), torch.from_numpy(inputs["ctx"]),
            torch.from_numpy(inputs["y"]),
        )


def test_glv_control_pyramid_matches_reference(tiny_torch, inputs):
    ctrl_t, _, params = tiny_torch
    want = _control_pyramid_torch(ctrl_t, inputs)

    model = GLVControl(CFG.unet)
    with jax.default_matmul_precision("float32"):
        got = model.apply(
            {"params": params["control"]},
            jnp.asarray(O.nhwc(inputs["x_lq"])), jnp.asarray(inputs["t"]),
            jnp.asarray(O.nhwc(inputs["xt"])), jnp.asarray(inputs["ctx"]),
            jnp.asarray(inputs["y"]),
        )
    assert len(got) == len(want) == 10
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            O.nchw(g), O._np(w), atol=ATOL, rtol=1e-3,
            err_msg=f"control feature {i}",
        )


def test_light_glv_unet_matches_reference(tiny_torch, inputs):
    """Full control+UNet composition: 10 control features through all 13
    adaptors (ZeroSFT x11 + inserted ZeroCrossAttn x2) to the eps head."""
    ctrl_t, unet_t, params = tiny_torch
    control_t = _control_pyramid_torch(ctrl_t, inputs)
    for control_scale in (1.0, 0.7):
        with torch.no_grad():
            want = unet_t(
                torch.from_numpy(inputs["xt"]), torch.from_numpy(inputs["t"]),
                context=torch.from_numpy(inputs["ctx"]),
                y=torch.from_numpy(inputs["y"]),
                control=list(control_t), control_scale=control_scale,
            )

        model = LightGLVUNet(CFG.unet, CFG.control)
        with jax.default_matmul_precision("float32"):
            control_j = [jnp.asarray(O.nhwc(c)) for c in control_t]
            got = model.apply(
                {"params": params["unet"]},
                jnp.asarray(O.nhwc(inputs["xt"])), jnp.asarray(inputs["t"]),
                jnp.asarray(inputs["ctx"]), jnp.asarray(inputs["y"]),
                control_j, control_scale=control_scale,
            )
        np.testing.assert_allclose(
            O.nchw(got), O._np(want), atol=ATOL, rtol=1e-3,
            err_msg=f"control_scale={control_scale}",
        )


def test_denoiser_with_control_matches_reference(tiny_torch, inputs):
    """One complete DiscreteDenoiserWithControl call (denoiser.py:66-75):
    sigma quantization + EpsScaling pre/post-conditioning around the full
    control+UNet network, via the reference's ControlWrapper call shape
    (wrappers.py:68-103)."""
    ctrl_t, unet_t, params = tiny_torch
    ref = O.load_ref()

    den_t = ref["denoiser"].DiscreteDenoiserWithControl(
        weighting_config={
            "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"
        },
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling"
        },
        num_idx=1000,
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"
        },
    )

    def network_t(x, t, c, control_scale):
        control = ctrl_t(c["control"], t, x, c["crossattn"], c["vector"])
        return unet_t(x, t, context=c["crossattn"], y=c["vector"],
                      control=control, control_scale=control_scale)

    sigma = torch.tensor([2.5])
    cond_t = {
        "control": torch.from_numpy(inputs["x_lq"]),
        "crossattn": torch.from_numpy(inputs["ctx"]),
        "vector": torch.from_numpy(inputs["y"]),
    }
    with torch.no_grad():
        want = den_t(network_t, torch.from_numpy(inputs["xt"]), sigma,
                     cond_t, 0.9)

    from supir_tpu.diffusion.denoiser import DiscreteDenoiser

    den_j = DiscreteDenoiser()
    ctrl_j = GLVControl(CFG.unet)
    unet_j = LightGLVUNet(CFG.unet, CFG.control)

    def network_j(x, t, cond, control_scale):
        control = ctrl_j.apply({"params": params["control"]},
                               cond["control"], t, x, cond["crossattn"],
                               cond["vector"])
        return unet_j.apply({"params": params["unet"]}, x, t,
                            cond["crossattn"], cond["vector"], control,
                            control_scale=control_scale)

    cond_j = {
        "control": jnp.asarray(O.nhwc(inputs["x_lq"])),
        "crossattn": jnp.asarray(inputs["ctx"]),
        "vector": jnp.asarray(inputs["y"]),
    }
    with jax.default_matmul_precision("float32"):
        got = den_j(network_j, jnp.asarray(O.nhwc(inputs["xt"])),
                    jnp.asarray([2.5]), cond_j, 0.9)
    np.testing.assert_allclose(O.nchw(got), O._np(want), atol=ATOL, rtol=1e-3)
