"""TILED-path torch-golden parity: the reference's OWN
`TiledRestoreEDMSampler` (sampling.py:600-660) inside its own
`SUPIRModel.batchify_sample` at tiny width vs our
`batchify_sample_tiled`, weights pushed through the production converter.

The flat-path capstone (test_ref_golden_e2e.py) cannot catch tiled-only
divergences: the Gaussian blend weights (sampling.py:733-751), the
sliding-window coordinates incl. the ragged tail (:753-766), per-tile
control-latent slicing for BOTH cond and uncond (:640-641), per-tile
x_center slicing (:635), the accumulate/normalize order (:652-658), and
per-tile LOCAL PROMPTS (cond as a list, :613-617 + SUPIR_model.py:167-178).
This test pins each of those against the reference's own loop.

16x16 latent, tile 8 / stride 4 -> 9 tiles with 4-pixel overlaps on both
axes. Stochastic inputs injected identically on both sides via the
noise/center-noise overrides that were mirrored into
`batchify_sample_tiled` (engine/supir.py) for exactly this test.
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
ATOL = 5e-4  # same budget as the flat e2e golden
TILE, STRIDE = 8, 4
N_TILES = 9  # 16x16 latent: hi/wi in {0,4,8} each

KW = dict(
    num_steps=3,
    restoration_scale=4.0,
    s_churn=0.0,  # churn noise is step-goldened in test_ref_golden_sampler
    s_noise=1.003,
    cfg_scale=4.0,
    seed=7,
    control_scale=0.9,
)


def _cpu_gaussian_weights(sampling_mod):
    """The reference's gaussian_weights hardcodes device='cuda'
    (sampling.py:751); re-bind the identical formula on CPU so the oracle
    runs here. Same var=0.01, same asymmetric midpoints ((w-1)/2 vs h/2)."""
    import math

    def gw(tile_width, tile_height, nbatches):
        var = 0.01
        midx = (tile_width - 1) / 2
        x_probs = [
            math.exp(-(x - midx) ** 2 / (tile_width * tile_width) / (2 * var))
            / math.sqrt(2 * math.pi * var)
            for x in range(tile_width)
        ]
        midy = tile_height / 2
        y_probs = [
            math.exp(-(y - midy) ** 2 / (tile_height * tile_height) / (2 * var))
            / math.sqrt(2 * math.pi * var)
            for y in range(tile_height)
        ]
        w = np.outer(y_probs, x_probs)
        return torch.tile(torch.tensor(w), (nbatches, 4, 1, 1))

    sampling_mod.gaussian_weights = gw


@pytest.fixture(scope="module")
def harness():
    # patch BEFORE building: TiledRestoreEDMSampler.__init__ computes its
    # blend weights at construction time
    _cpu_gaussian_weights(O.load_ref()["sampling"])
    m = O.build_tiny_supir_model(
        num_steps=KW["num_steps"], tiled=True, tile_size=TILE,
        tile_stride=STRIDE,
    )
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params, report = C.convert_supir_state_dict(sd, CFG, with_conditioner=False)
    assert not report.missing, report.missing[:8]

    rng = np.random.default_rng(1)
    data = dict(
        x=np.tanh(rng.standard_normal((1, 3, 128, 128)).astype(np.float32)),
        ca=(rng.standard_normal((N_TILES, 1, 77, 64)) * 0.3).astype(np.float32),
        vec=(rng.standard_normal((1, 96)) * 0.3).astype(np.float32),
        ca_uc=(rng.standard_normal((1, 77, 64)) * 0.3).astype(np.float32),
        vec_uc=(rng.standard_normal((1, 96)) * 0.3).astype(np.float32),
        noise=rng.standard_normal((1, 4, 16, 16)).astype(np.float32),
        center_noise=rng.standard_normal((1, 4, 16, 16)).astype(np.float32),
    )
    return m, params, data


def _torch_run(m, d, local_prompts):
    """Drive the reference batchify_sample with the tiled sampler,
    injecting conditioning + noise; cond becomes a per-tile LIST when
    local_prompts (SUPIR_model.prepare_condition's list branch,
    SUPIR_model.py:167-178)."""

    def fake_prepare(_z, p, p_p, n_p, N):
        uc = {
            "crossattn": torch.from_numpy(d["ca_uc"]),
            "vector": torch.from_numpy(d["vec_uc"]),
            "control": _z,
        }
        if not local_prompts:
            c = {
                "crossattn": torch.from_numpy(d["ca"][0]),
                "vector": torch.from_numpy(d["vec"]),
                "control": _z,
            }
            return c, uc
        c = [
            {
                "crossattn": torch.from_numpy(d["ca"][t]),
                "vector": torch.from_numpy(d["vec"]),
                "control": _z,
            }
            for t in range(N_TILES)
        ]
        return c, uc

    m.prepare_condition = fake_prepare
    orig_rl, orig_rn = torch.randn_like, torch.randn
    # fresh tensor per call: prepare_sampling_loop multiplies x in place.
    # The tiled sampler also draws one (unused at s_churn=0) eps_noise per
    # step from randn_like — a fixed return value keeps both sides aligned.
    torch.randn_like = lambda t, **kw: torch.from_numpy(d["noise"].copy()).to(
        t.dtype
    )
    torch.randn = lambda *s, **kw: torch.from_numpy(d["center_noise"].copy())
    try:
        with torch.no_grad():
            out = m.batchify_sample(
                torch.from_numpy(d["x"]),
                [["p"] * N_TILES] if local_prompts else ["p"],
                p_p="",
                n_p="",
                use_linear_CFG=True,
                use_linear_control_scale=True,
                cfg_scale_start=7.5,
                control_scale_start=0.0,
                color_fix_type="Wavelet",
                **KW,
            )
    finally:
        torch.randn_like, torch.randn = orig_rl, orig_rn
        del m.prepare_condition
    return out.numpy()


def _jax_run(params, d, local_prompts, tile_chunk=None, steps_per_call=None):
    eng = SUPIREngine(CFG, params)
    c = {
        "crossattn": jnp.asarray(d["ca"][0]),
        "vector": jnp.asarray(d["vec"]),
    }
    if local_prompts:
        c["crossattn_tiles"] = jnp.asarray(d["ca"])  # [T, 1, 77, D]
    uc = {
        "crossattn": jnp.asarray(d["ca_uc"]),
        "vector": jnp.asarray(d["vec_uc"]),
    }
    xj = jnp.asarray(O.nhwc(d["x"]))
    with jax.default_matmul_precision("float32"):
        z = eng.encode_first_stage_with_denoise(xj)
        c["control"] = z
        uc["control"] = z
        got = eng.batchify_sample_tiled(
            xj,
            c,
            uc,
            tile_size=TILE,
            tile_stride=STRIDE,
            use_linear_cfg=True,
            use_linear_control_scale=True,
            cfg_scale_start=7.5,
            control_scale_start=0.0,
            color_fix_type="Wavelet",
            noise_override=jnp.asarray(O.nhwc(d["noise"])),
            center_noise_override=jnp.asarray(O.nhwc(d["center_noise"])),
            tile_chunk=tile_chunk,
            steps_per_call=steps_per_call,
            **KW,
        )
    return O.nchw(got)


def test_tiled_sample_matches_reference(harness):
    m, params, d = harness
    want = _torch_run(m, d, local_prompts=False)
    got = _jax_run(params, d, local_prompts=False)
    assert want.shape == got.shape == (1, 3, 128, 128)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


def test_tiled_sample_local_prompts_matches_reference(harness):
    m, params, d = harness
    want = _torch_run(m, d, local_prompts=True)
    got = _jax_run(params, d, local_prompts=True)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)
    # the per-tile prompts must actually matter: a uniform-prompt run
    # diverges from the local-prompt run
    uniform = _jax_run(params, d, local_prompts=False)
    assert np.abs(uniform - got).max() > 1e-5


def test_tiled_chunked_segmented_matches_reference(harness):
    """The production memory-bounding knobs (tile_chunk, steps_per_call)
    must not change the math vs the reference loop."""
    m, params, d = harness
    want = _torch_run(m, d, local_prompts=False)
    got = _jax_run(params, d, local_prompts=False, tile_chunk=4,
                   steps_per_call=2)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)
