"""Full VAE torch-golden parity: the reference's OWN sgm Encoder/Decoder
(`sgm/modules/diffusionmodules/model.py:482-696`) + quant convs at tiny
width (ch=32), converted through our rules, vs our AutoencoderKL — encode
moments, decode, and the full encode->mode->decode roundtrip the engine
runs (`SUPIR/models/SUPIR_model.py:42-71`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from supir_tpu.config import VAEConfig
from supir_tpu.models.vae import AutoencoderKL, DiagonalGaussian
from supir_tpu.utils import ckpt as C
from tests import ref_oracle as O

torch = pytest.importorskip("torch")

CFG = VAEConfig().tiny()


@pytest.fixture(scope="module")
def converted():
    enc, dec, quant, post_quant = O.build_tiny_vae()
    sd = O.state_dict_np(enc, "first_stage_model.encoder.")
    # the denoise encoder is a parallel branch with identical key shapes;
    # reuse the same encoder weights for it (the converter must map both)
    sd.update(O.state_dict_np(enc, "first_stage_model.denoise_encoder."))
    sd.update(O.state_dict_np(dec, "first_stage_model.decoder."))
    sd.update(O.state_dict_np(quant, "first_stage_model.quant_conv."))
    sd.update(O.state_dict_np(post_quant, "first_stage_model.post_quant_conv."))

    tree, report, used = {}, C.ConversionReport(), set()
    C.apply_rules(sd, C.vae_rules(CFG), tree, report, used)
    assert not report.missing, report.missing[:8]
    unused = sorted(k for k in sd if k not in used)
    assert not unused, unused[:8]
    return enc, dec, quant, post_quant, tree


def test_vae_encode_decode_roundtrip_matches_reference(converted):
    enc, dec, quant, post_quant, tree = converted
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        moments_t = quant(enc(torch.from_numpy(x)))
        mean_t, _ = torch.chunk(moments_t, 2, dim=1)
        out_t = dec(post_quant(mean_t))

    vae = AutoencoderKL(CFG)
    with jax.default_matmul_precision("float32"):
        moments_j = vae.apply({"params": tree}, jnp.asarray(O.nhwc(x)),
                              method=vae.moments)
        z_j = DiagonalGaussian(moments_j).mode()
        out_j = vae.apply({"params": tree}, z_j, method=vae.decode)

    np.testing.assert_allclose(O.nchw(moments_j), O._np(moments_t),
                               atol=2e-3, rtol=2e-3, err_msg="moments")
    np.testing.assert_allclose(O.nchw(out_j), O._np(out_t),
                               atol=2e-3, rtol=2e-3, err_msg="decode")


def test_vae_denoise_encoder_branch_matches_reference(converted):
    """The degradation-robust encoder clone (`denoise_encoder`) must route
    through its own parameter branch and reproduce the torch encoder it was
    converted from (SUPIR_model.py:49-63)."""
    enc, dec, quant, post_quant, tree = converted
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        want = quant(enc(torch.from_numpy(x)))

    vae = AutoencoderKL(CFG)
    with jax.default_matmul_precision("float32"):
        got = vae.apply({"params": tree}, jnp.asarray(O.nhwc(x)), True,
                        method=vae.moments)
    np.testing.assert_allclose(O.nchw(got), O._np(want), atol=2e-3, rtol=2e-3)
