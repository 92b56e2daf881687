"""Plain SDXL UNetModel (txt2img path) converter roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supir_tpu.config import SUPIRConfig
from supir_tpu.models.unet import UNetModel
from supir_tpu.utils import ckpt as C
from tests.test_ckpt_converter import _fake_torch_sd_from_flax, _flatten


@pytest.mark.heavy
def test_plain_unet_rules_roundtrip():
    cfg = SUPIRConfig.tiny().unet
    unet = UNetModel(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 77, cfg.context_dim))
    y = jnp.zeros((1, cfg.adm_in_channels))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx, y)["params"]

    rules = C.plain_unet_rules(cfg)
    sd = _fake_torch_sd_from_flax(rules, _flatten(params))
    out_tree, report, used = {}, C.ConversionReport(), set()
    C.apply_rules(sd, rules, out_tree, report, used)
    assert not report.missing, report.missing[:8]
    got, want = _flatten(out_tree), _flatten(params)
    assert set(got) == set(want), (
        sorted(set(got) - set(want))[:4], sorted(set(want) - set(got))[:4]
    )
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=str(k))
    # and the converted tree actually drives the model
    out = unet.apply({"params": out_tree}, x, t, ctx, y)
    assert out.shape == x.shape
