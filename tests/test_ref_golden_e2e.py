"""END-TO-END torch-golden parity: the reference's OWN
`SUPIRModel.batchify_sample` (SUPIR_model.py:80-135) driven at tiny width
for a full 3-step restoration — stage-1 denoise-encode, decode, SAMPLED
x_center re-encode (AutoencoderKLInferenceWrapper.encode, autoencoder.py:
319-321), sampler re-instantiation from mutated config, linear CFG +
linear control-scale schedules, restoration guidance, Euler steps, VAE
decode, wavelet color fix — against our `SUPIREngine.batchify_sample`
with the state dict pushed through the production converter.

This is the capstone over the module-level goldens
(test_ref_golden_{network,sampler,vae}.py): it proves the ENGINE GLUE —
conditioning dict plumbing, CFG fold into the batch axis, step-table
construction from `batchify_sample` kwargs, noise-scale contract, the
x_center posterior SAMPLE (not mode), colorfix application order — not
just the pieces.

Stochastic inputs are injected identically on both sides: the init noise
via a `torch.randn_like` patch / `noise_override`, the x_center posterior
noise via a `torch.randn` patch / `center_noise_override`. The torch
patches must return a FRESH tensor per call: `prepare_sampling_loop`
multiplies its x in place (sampling.py:51), so a shared-memory
`from_numpy` view would corrupt the injected buffer.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from supir_tpu.config import SUPIRConfig
from supir_tpu.engine.supir import SUPIREngine
from supir_tpu.utils import ckpt as C
from tests import ref_oracle as O

torch = pytest.importorskip("torch")

CFG = dataclasses.replace(
    SUPIRConfig.tiny(), ae_dtype="fp32", diffusion_dtype="fp32"
)
# fp32 end-to-end: ~1e-5-scale drift through 3 full denoiser calls + two
# VAE round trips on an output in [-1, 1]
ATOL = 5e-4

KW = dict(
    num_steps=3,
    restoration_scale=4.0,
    s_churn=0.0,  # churn noise is step-level-goldened in test_ref_golden_sampler
    s_noise=1.003,
    cfg_scale=4.0,
    seed=7,
    control_scale=0.9,
)


@pytest.fixture(scope="module")
def harness():
    m = O.build_tiny_supir_model(num_steps=KW["num_steps"])
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params, report = C.convert_supir_state_dict(sd, CFG, with_conditioner=False)
    assert not report.missing, report.missing[:8]
    stray = [k for k in report.unused if not k.startswith("denoiser.")]
    assert not stray, stray[:8]

    rng = np.random.default_rng(0)
    data = dict(
        x=np.tanh(rng.standard_normal((1, 3, 64, 64)).astype(np.float32)),
        ca=(rng.standard_normal((1, 77, 64)) * 0.3).astype(np.float32),
        vec=(rng.standard_normal((1, 96)) * 0.3).astype(np.float32),
        ca_uc=(rng.standard_normal((1, 77, 64)) * 0.3).astype(np.float32),
        vec_uc=(rng.standard_normal((1, 96)) * 0.3).astype(np.float32),
        noise=rng.standard_normal((1, 4, 8, 8)).astype(np.float32),
        center_noise=rng.standard_normal((1, 4, 8, 8)).astype(np.float32),
    )
    return m, params, data


def _torch_run(m, d, color_fix_type):
    """Drive the reference batchify_sample with injected conditioning +
    noise. prepare_condition itself is conditioner territory (embedder
    parity lives in tests/test_ckpt_manifest.py + models/embedders tests);
    here it is pinned to fixed tensors so the ENGINE wiring is isolated."""

    def fake_prepare(_z, p, p_p, n_p, N):
        c = {
            "crossattn": torch.from_numpy(d["ca"]),
            "vector": torch.from_numpy(d["vec"]),
            "control": _z,
        }
        uc = {
            "crossattn": torch.from_numpy(d["ca_uc"]),
            "vector": torch.from_numpy(d["vec_uc"]),
            "control": _z,
        }
        return c, uc

    m.prepare_condition = fake_prepare
    orig_rl, orig_rn = torch.randn_like, torch.randn
    torch.randn_like = lambda t, **kw: torch.from_numpy(d["noise"].copy()).to(
        t.dtype
    )
    torch.randn = lambda *s, **kw: torch.from_numpy(d["center_noise"].copy())
    try:
        with torch.no_grad():
            out = m.batchify_sample(
                torch.from_numpy(d["x"]),
                ["p"],
                p_p="",
                n_p="",
                use_linear_CFG=True,
                use_linear_control_scale=True,
                cfg_scale_start=7.5,
                control_scale_start=0.0,
                color_fix_type=color_fix_type,
                **KW,
            )
    finally:
        torch.randn_like, torch.randn = orig_rl, orig_rn
        del m.prepare_condition
    return out.numpy()


def _jax_run(params, d, color_fix_type):
    eng = SUPIREngine(CFG, params)
    c = {"crossattn": jnp.asarray(d["ca"]), "vector": jnp.asarray(d["vec"])}
    uc = {
        "crossattn": jnp.asarray(d["ca_uc"]),
        "vector": jnp.asarray(d["vec_uc"]),
    }
    xj = jnp.asarray(O.nhwc(d["x"]))
    with jax.default_matmul_precision("float32"):
        z = eng.encode_first_stage_with_denoise(xj)
        c["control"] = z
        uc["control"] = z
        got = eng.batchify_sample(
            xj,
            c,
            uc,
            use_linear_cfg=True,
            use_linear_control_scale=True,
            cfg_scale_start=7.5,
            control_scale_start=0.0,
            color_fix_type=color_fix_type,
            noise_override=jnp.asarray(O.nhwc(d["noise"])),
            center_noise_override=jnp.asarray(O.nhwc(d["center_noise"])),
            **KW,
        )
    return O.nchw(got)


def test_batchify_sample_matches_reference_wavelet(harness):
    m, params, d = harness
    want = _torch_run(m, d, "Wavelet")
    got = _jax_run(params, d, "Wavelet")
    assert want.shape == got.shape == (1, 3, 64, 64)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


def test_batchify_sample_matches_reference_adain(harness):
    m, params, d = harness
    want = _torch_run(m, d, "AdaIn")
    got = _jax_run(params, d, "AdaIn")
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)
