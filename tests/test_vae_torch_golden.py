"""VAE block torch-golden parity + timestep-embedding formula golden."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from supir_tpu.models.layers import timestep_embedding
from supir_tpu.models.vae import VAEAttnBlock, VAEResnetBlock
from supir_tpu.utils import ckpt as C


def _np(x):
    return x.detach().cpu().numpy()


def test_vae_resblock_matches_torch(rng):
    cin, cout = 32, 64

    class TorchVAEBlock(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.GroupNorm(32, cin, eps=1e-6)
            self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
            self.norm2 = torch.nn.GroupNorm(32, cout, eps=1e-6)
            self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
            self.nin_shortcut = torch.nn.Conv2d(cin, cout, 1)

        def forward(self, x):
            h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
            h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
            return self.nin_shortcut(x) + h

    tm = TorchVAEBlock().eval()
    sd = {f"blk.{k}": v for k, v in tm.state_dict().items()}
    rules = C._vae_resblock("blk", (), has_nin=True)
    tree, report, used = {}, C.ConversionReport(), set()
    C.apply_rules(sd, rules, tree, report, used)
    assert not report.missing and len(used) == len(sd)

    x = rng.standard_normal((1, cin, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = _np(tm(torch.from_numpy(x)))
    got = VAEResnetBlock(cout).apply(
        {"params": tree}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=2e-4
    )


def test_vae_attn_block_matches_torch(rng):
    c = 32

    class TorchAttn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm = torch.nn.GroupNorm(32, c, eps=1e-6)
            self.q = torch.nn.Conv2d(c, c, 1)
            self.k = torch.nn.Conv2d(c, c, 1)
            self.v = torch.nn.Conv2d(c, c, 1)
            self.proj_out = torch.nn.Conv2d(c, c, 1)

        def forward(self, x):
            h = self.norm(x)
            q, k, v = self.q(h), self.k(h), self.v(h)
            b, ch, hh, ww = q.shape
            q = q.reshape(b, ch, hh * ww).permute(0, 2, 1)
            k = k.reshape(b, ch, hh * ww).permute(0, 2, 1)
            v = v.reshape(b, ch, hh * ww).permute(0, 2, 1)
            o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
            o = o.permute(0, 2, 1).reshape(b, ch, hh, ww)
            return x + self.proj_out(o)

    tm = TorchAttn().eval()
    sd = {f"a.{k}": v for k, v in tm.state_dict().items()}
    rules = C._vae_attn("a", ())
    tree, report, used = {}, C.ConversionReport(), set()
    C.apply_rules(sd, rules, tree, report, used)
    assert not report.missing and len(used) == len(sd)

    x = rng.standard_normal((1, c, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = _np(tm(torch.from_numpy(x)))
    got = VAEAttnBlock().apply(
        {"params": tree}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=2e-4
    )


def test_timestep_embedding_matches_reference_formula():
    """cos-first ordering, max_period 10000 (util.py:206-230)."""
    import math

    t = jnp.array([0.0, 1.0, 500.0, 999.0])
    dim = 32
    emb = np.asarray(timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(emb, want, atol=3e-5)  # fp32 vs fp64 freqs
    # t=0: cos part 1, sin part 0
    np.testing.assert_allclose(emb[0, :half], 1.0)
    np.testing.assert_allclose(emb[0, half:], 0.0)
