"""MPT prefix-LM + init-fn family vs the reference's OWN torch modules.

Oracles: `llava/model/language_model/mpt/blocks.py` MPTBlock (attn_impl
'torch'), `attention.py` build_attn_bias (full ALiBi), the prefix masking
of `modeling_mpt.py:119-131`, and `param_init_fns.py` MODEL_INIT_REGISTRY.
Loaded as a standalone package (the mpt modules only need torch/einops;
modeling_mpt itself drags in transformers internals that moved)."""

import importlib.util
import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from supir_tpu.captioner.convert import convert_mpt_state_dict  # noqa: E402
from supir_tpu.captioner.mpt import (  # noqa: E402
    MODEL_INIT_REGISTRY,
    MPTConfig,
    MPTForCausalLM,
    init_mpt_params,
)

MPT_DIR = "/root/reference/llava/model/language_model/mpt"


def _load_ref_mpt():
    if "refmpt" in sys.modules:
        return sys.modules["refmpt"]
    pkg = types.ModuleType("refmpt")
    pkg.__path__ = [MPT_DIR]
    sys.modules["refmpt"] = pkg
    for mod in ("norm", "attention", "blocks", "param_init_fns"):
        spec = importlib.util.spec_from_file_location(
            f"refmpt.{mod}", f"{MPT_DIR}/{mod}.py"
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"refmpt.{mod}"] = m
        spec.loader.exec_module(m)
        setattr(pkg, mod, m)
    return pkg


CFG = MPTConfig(
    vocab_size=96, d_model=48, n_layers=2, n_heads=4, max_seq_len=32,
    prefix_lm=True,
)


@pytest.fixture(scope="module")
def ref_model():
    """torch (wte, blocks, norm_f) with linear biases zeroed (our MPT is
    the no-bias family) -> (torch modules, converted JAX params)."""
    ref = _load_ref_mpt()
    torch.manual_seed(0)
    attn_cfg = dict(
        attn_type="multihead_attention", attn_pdrop=0.0, attn_impl="torch",
        qk_ln=False, clip_qkv=None, softmax_scale=None, prefix_lm=True,
        attn_uses_sequence_id=False, alibi=True,
        alibi_bias_max=CFG.alibi_bias_max,
    )
    blocks = [
        ref.blocks.MPTBlock(
            d_model=CFG.d_model, n_heads=CFG.n_heads, expansion_ratio=4,
            attn_config=attn_cfg,
        ).eval()
        for _ in range(CFG.n_layers)
    ]
    wte = torch.nn.Embedding(CFG.vocab_size, CFG.d_model)
    norm_f = ref.norm.LPLayerNorm(CFG.d_model)
    with torch.no_grad():
        for b in blocks:
            b.attn.Wqkv.bias.zero_()
            b.attn.out_proj.bias.zero_()
            b.ffn.up_proj.bias.zero_()
            b.ffn.down_proj.bias.zero_()
        # give norms non-trivial params so the test exercises them
        for m in [norm_f] + [b.norm_1 for b in blocks] + [b.norm_2 for b in blocks]:
            m.weight.uniform_(0.8, 1.2)
            m.bias.uniform_(-0.1, 0.1)

    sd = {"transformer.wte.weight": wte.weight.detach().numpy(),
          "transformer.norm_f.weight": norm_f.weight.detach().numpy(),
          "transformer.norm_f.bias": norm_f.bias.detach().numpy()}
    for i, b in enumerate(blocks):
        p = f"transformer.blocks.{i}"
        for n, m in (("norm_1", b.norm_1), ("norm_2", b.norm_2)):
            sd[f"{p}.{n}.weight"] = m.weight.detach().numpy()
            sd[f"{p}.{n}.bias"] = m.bias.detach().numpy()
        for n, m in (("attn.Wqkv", b.attn.Wqkv), ("attn.out_proj", b.attn.out_proj),
                     ("ffn.up_proj", b.ffn.up_proj), ("ffn.down_proj", b.ffn.down_proj)):
            sd[f"{p}.{n}.weight"] = m.weight.detach().numpy()
    params, report = convert_mpt_state_dict(sd, CFG)
    assert not report.missing, report.missing[:5]
    return ref, wte, blocks, norm_f, params


def _ref_forward_prefix(ref, wte, blocks, norm_f, ids, prefix_mask):
    """The reference MPTModel.forward prefix-LM path (modeling_mpt.py:88-131
    _attn_bias + _apply_prefix_mask), reproduced around its own blocks."""
    s = ids.shape[1]
    with torch.no_grad():
        bias = torch.zeros(
            1, CFG.n_heads, CFG.max_seq_len, CFG.max_seq_len, dtype=torch.float32
        )
        bias = ref.attention.build_attn_bias(
            "torch", bias, CFG.n_heads, CFG.max_seq_len, causal=False,
            alibi=True, alibi_bias_max=CFG.alibi_bias_max,
        )
        bias = bias[..., :s, :s]
        causal = torch.tril(torch.ones(s, s, dtype=torch.bool)).view(1, 1, s, s)
        prefix = torch.from_numpy(prefix_mask).bool().view(-1, 1, 1, s)
        cannot = ~torch.logical_or(causal, prefix)
        bias = bias.masked_fill(cannot, torch.finfo(torch.float32).min)

        x = wte(torch.from_numpy(ids))
        for b in blocks:
            x, _, _ = b(x, attn_bias=bias, is_causal=False)
        x = norm_f(x)
        return (x @ wte.weight.T).numpy()  # tied lm head


def test_prefix_lm_logits_vs_reference(ref_model):
    ref, wte, blocks, norm_f, params = ref_model
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, (2, 12), dtype=np.int64)
    prefix = np.zeros((2, 12), np.int64)
    prefix[0, :5] = 1   # row 0: 5-token bidirectional prefix
    prefix[1, :9] = 1   # row 1: 9-token prefix

    model = MPTForCausalLM(CFG)
    ours = model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        prefix_mask=jnp.asarray(prefix, jnp.int32),
    )
    golden = _ref_forward_prefix(ref, wte, blocks, norm_f, ids, prefix)
    np.testing.assert_allclose(np.asarray(ours), golden, atol=3e-4, rtol=3e-4)


def test_prefix_all_zero_equals_causal(ref_model):
    """prefix_mask of zeros must reproduce the plain causal forward: the
    full-ALiBi+mask path and the causal column-bias path are the same
    program after softmax shift invariance."""
    import dataclasses as dc

    _, _, _, _, params = ref_model
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 10)), jnp.int32)
    model = MPTForCausalLM(CFG)
    with_prefix = model.apply(
        {"params": params}, ids, prefix_mask=jnp.zeros((1, 10), jnp.int32)
    )
    causal_model = MPTForCausalLM(dc.replace(CFG, prefix_lm=False))
    causal = causal_model.apply({"params": params}, ids)
    np.testing.assert_allclose(
        np.asarray(with_prefix), np.asarray(causal), atol=3e-4, rtol=3e-4
    )


def test_prefix_mask_required_and_rejected(ref_model):
    import dataclasses as dc

    _, _, _, _, params = ref_model
    model = MPTForCausalLM(CFG)
    ids = jnp.zeros((1, 4), jnp.int32)
    with pytest.raises(ValueError, match="prefix_mask is required"):
        model.apply({"params": params}, ids)  # prefix_lm=True needs a mask
    causal_model = MPTForCausalLM(dc.replace(CFG, prefix_lm=False))
    with pytest.raises(ValueError, match="prefix_lm=True"):
        causal_model.apply(
            {"params": params}, ids, prefix_mask=jnp.ones((1, 4), jnp.int32)
        )


def test_prefix_attends_forward_inside_prefix(ref_model):
    """Behavioral: with a prefix, changing a LATER prefix token must change
    an EARLIER prefix position's logits (bidirectional); outside the
    prefix, causality still holds."""
    _, _, _, _, params = ref_model
    rng = np.random.default_rng(3)
    ids = rng.integers(0, CFG.vocab_size, (1, 12), dtype=np.int64)
    prefix = np.zeros((1, 12), np.int64)
    prefix[0, :6] = 1
    model = MPTForCausalLM(CFG)

    def run(i):
        return np.asarray(model.apply(
            {"params": params}, jnp.asarray(i, jnp.int32),
            prefix_mask=jnp.asarray(prefix, jnp.int32),
        ))

    base = run(ids)
    ids2 = ids.copy()
    ids2[0, 5] = (ids2[0, 5] + 1) % CFG.vocab_size  # inside prefix
    flipped = run(ids2)
    assert not np.allclose(base[0, 0], flipped[0, 0]), "prefix not bidirectional"
    ids3 = ids.copy()
    ids3[0, 11] = (ids3[0, 11] + 1) % CFG.vocab_size  # past the prefix
    flipped3 = run(ids3)
    np.testing.assert_allclose(base[0, :11], flipped3[0, :11], atol=1e-5)


# --------------------------------------------------------------- init fns


@pytest.mark.parametrize("name", ["kaiming_normal_", "small_init_",
                                  "baseline_", "neox_init_"])
def test_init_registry_matches_torch_oracle(name):
    """Per-tensor empirical std of our init tree vs the reference's
    param_init_fns applied to its own torch MPTBlock (statistical oracle:
    large tensors, 12% tolerance). Covers the residual-divide semantics
    (out_proj/down_proj / sqrt(2*n_layers); neox n_layers/sqrt(10))."""
    ref = _load_ref_mpt()
    cfg = MPTConfig(vocab_size=512, d_model=256, n_layers=4, n_heads=4,
                    max_seq_len=32)
    kwargs = dict(n_layers=cfg.n_layers, d_model=cfg.d_model)
    if name == "baseline_":
        kwargs["init_std"] = 0.02
    torch.manual_seed(0)
    block = ref.blocks.MPTBlock(
        d_model=cfg.d_model, n_heads=cfg.n_heads, expansion_ratio=4,
        attn_config=dict(
            attn_type="multihead_attention", attn_pdrop=0.0,
            attn_impl="torch", qk_ln=False, clip_qkv=None,
            softmax_scale=None, prefix_lm=False,
            attn_uses_sequence_id=False, alibi=True, alibi_bias_max=8,
        ),
    )
    init_fn = ref.param_init_fns.MODEL_INIT_REGISTRY[name]
    block.apply(lambda m: init_fn(module=m, **kwargs))

    ours = init_mpt_params(cfg, seed=0, name=name,
                           init_std=kwargs.get("init_std"))
    pairs = [
        (block.attn.Wqkv.weight, ours["block_0"]["Wqkv"]["Dense_0"]["kernel"]),
        (block.attn.out_proj.weight, ours["block_0"]["out_proj"]["Dense_0"]["kernel"]),
        (block.ffn.up_proj.weight, ours["block_0"]["up_proj"]["Dense_0"]["kernel"]),
        (block.ffn.down_proj.weight, ours["block_0"]["down_proj"]["Dense_0"]["kernel"]),
    ]
    for tw, jw in pairs:
        t_std = float(tw.detach().float().std())
        j_std = float(np.asarray(jw).std())
        assert math.isclose(t_std, j_std, rel_tol=0.12), (
            f"{name}: torch std {t_std:.5f} vs ours {j_std:.5f}"
        )
    # norms: ones / zeros
    np.testing.assert_array_equal(
        np.asarray(ours["block_0"]["norm_1"]["ln"]["scale"]), 1.0
    )
    np.testing.assert_array_equal(
        np.asarray(ours["block_0"]["norm_1"]["ln"]["bias"]), 0.0
    )


def test_init_registry_surface():
    assert set(MODEL_INIT_REGISTRY) == {
        "default_", "baseline_", "kaiming_uniform_", "kaiming_normal_",
        "neox_init_", "small_init_", "xavier_uniform_", "xavier_normal_",
    }  # param_init_fns.py:181
    with pytest.raises(KeyError):
        init_mpt_params(MPTConfig().tiny(), name="nope_")
    # init tree must be loadable by the model
    cfg = MPTConfig().tiny()
    params = init_mpt_params(cfg, seed=0, name="kaiming_uniform_")
    logits = MPTForCausalLM(cfg).apply(
        {"params": params}, jnp.zeros((1, 4), jnp.int32)
    )
    assert np.isfinite(np.asarray(logits)).all()
