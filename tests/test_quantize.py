"""Int8 quantization: reconstruction error, matmul path, tree sweep."""

import jax
import jax.numpy as jnp
import numpy as np

from supir_tpu.ops.quantize import int8_matmul, quantize_int8, quantize_tree_int8


def test_quantize_roundtrip_error(rng):
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    q, scale = quantize_int8(w, interpret=True)
    assert q.dtype == jnp.int8 and scale.shape == (1, 32)
    deq = q.astype(jnp.float32) * scale
    err = np.abs(np.asarray(deq - w)).max()
    # per-channel absmax/127 quantization step bound
    step = np.asarray(scale).max()
    assert err <= step * 0.51 + 1e-6


def test_int8_matmul_close(rng):
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    q, scale = quantize_int8(w, interpret=True)
    got = int8_matmul(x, q, scale)
    want = x @ w
    rel = np.abs(np.asarray(got - want)).mean() / np.abs(np.asarray(want)).mean()
    assert rel < 0.02, rel


def test_quantize_tree(rng):
    params = {
        "a": {"kernel": jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))},
        "bias": jnp.zeros(16),
    }
    qtree, saved = quantize_tree_int8(params)
    assert isinstance(qtree["a"]["kernel"], dict)
    assert qtree["a"]["kernel"]["q"].dtype == jnp.int8
    assert qtree["bias"].dtype == jnp.float32
    assert saved > 0


def test_int4_pack_unpack_roundtrip():
    import jax.numpy as jnp
    import numpy as np

    from supir_tpu.ops.quantize import int4_matmul, quantize_int4, unpack_int4

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    packed, scale = quantize_int4(w)
    assert packed.shape == (8, 8) and packed.dtype == jnp.uint8
    q = unpack_int4(packed)
    assert q.shape == (16, 8)
    assert int(q.max()) <= 7 and int(q.min()) >= -7
    # dequantized weights within one quantization step of the originals
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale) - np.asarray(w))
    assert err.max() <= np.asarray(scale).max() * 0.51 + 1e-6

    x = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
    y = int4_matmul(x, packed, scale)
    ref = np.asarray(x) @ (np.asarray(q, np.float32) * np.asarray(scale))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_int4_caption_identity_when_exact():
    """Weights snapped to the int4 grid -> int4 decode == fp decode."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from supir_tpu.captioner.agent import CaptionerAgent, CaptionerConfig
    from supir_tpu.captioner.llama import _PROJ_NAMES, quantize_llama_params
    from supir_tpu.ops.quantize import quantize_int4, unpack_int4

    cfg = CaptionerConfig.tiny()
    agent = CaptionerAgent.create_random(cfg)

    def snap(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k in _PROJ_NAMES and isinstance(v, dict) and "Dense_0" in v:
                w = jnp.asarray(v["Dense_0"]["kernel"], jnp.float32)
                q4, s = quantize_int4(w)
                out[k] = {"Dense_0": {"kernel": unpack_int4(q4).astype(jnp.float32) * s}}
            else:
                out[k] = snap(v)
        return out

    agent.params = dict(agent.params, llama=snap(agent.params["llama"]))
    img = np.random.default_rng(1).integers(
        0, 255, (cfg.vision.image_size, cfg.vision.image_size, 3), dtype=np.uint8
    )
    cap_fp = agent.gen_image_caption([img], temperature=0.0)[0]

    qparams, saved = quantize_llama_params(agent.params["llama"], bits=4)
    assert saved > 0
    qcfg = dc.replace(cfg, llama=dc.replace(cfg.llama, quantize_int4=True))
    agent_q = CaptionerAgent(qcfg, dict(agent.params, llama=qparams), tokenizer=None)
    cap_q = agent_q.gen_image_caption([img], temperature=0.0)[0]
    assert cap_q == cap_fp


def test_qmm_kernel_matches_fallback():
    """The Pallas dequant-fused matmul (int8 + half-split int4) must match
    the XLA dequantize-then-dot fallback exactly at kernel-viable shapes."""
    import jax
    import jax.numpy as jnp

    from supir_tpu.ops.quantize import (
        _qmm,
        quantize_int4,
        quantize_int8,
        unpack_int4,
    )

    rng = np.random.default_rng(0)
    cin, cout = 1024, 512
    w = jnp.asarray(rng.standard_normal((cin, cout)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, cin)), jnp.bfloat16)

    q8, s8 = quantize_int8(w, interpret=True)
    want8 = jnp.dot(x, q8.astype(x.dtype), preferred_element_type=jnp.float32)
    want8 = want8 * s8
    got8 = _qmm(x, q8, s8, bits=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(want8), rtol=2e-2, atol=1e-2)

    q4, s4 = quantize_int4(w)
    deq = unpack_int4(q4)
    want4 = jnp.dot(x, deq.astype(x.dtype), preferred_element_type=jnp.float32) * s4
    got4 = _qmm(x, q4, s4, bits=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(want4), rtol=2e-2, atol=1e-2)


def test_fused_qkv_quantized_decode_identical():
    """fused_qkv (merged qkv / gate-up GEMVs, LlamaConfig.fused_qkv) must be
    bit-identical to the unfused quantized decode: per-out-channel scales
    make the merged quantization equal to the separate ones, and the block
    splits the merged output back at the same offsets."""
    import dataclasses as dc

    import jax.numpy as jnp

    from supir_tpu.captioner.agent import CaptionerAgent, CaptionerConfig
    from supir_tpu.captioner.llama import quantize_llama_params

    cfg = CaptionerConfig.tiny()
    agent = CaptionerAgent.create_random(cfg)
    img = np.random.default_rng(2).integers(
        0, 255, (cfg.vision.image_size, cfg.vision.image_size, 3), dtype=np.uint8
    )

    for bits in (8, 4):
        qflags = dict(quantize_int8=bits == 8, quantize_int4=bits == 4)
        qp, _ = quantize_llama_params(agent.params["llama"], bits=bits)
        a_sep = CaptionerAgent(
            dc.replace(cfg, llama=dc.replace(cfg.llama, **qflags)),
            dict(agent.params, llama=qp),
        )
        qpf, _ = quantize_llama_params(agent.params["llama"], bits=bits, fuse=True)
        assert "qkv_proj" in qpf["model"]["layer_0"]
        assert "q_proj" not in qpf["model"]["layer_0"]
        a_fused = CaptionerAgent(
            dc.replace(cfg, llama=dc.replace(cfg.llama, fused_qkv=True, **qflags)),
            dict(agent.params, llama=qpf),
        )
        cap_sep = a_sep.gen_image_caption([img], temperature=0.0)[0]
        cap_fused = a_fused.gen_image_caption([img], temperature=0.0)[0]
        assert cap_sep == cap_fused, bits


def test_int4_paired_matches_halfsplit():
    """quantize_int4_paired (adjacent-pair packing for the in-kernel
    pltpu.bitcast) must produce the same value grid and scales as
    quantize_int4, and the same matmul result through the XLA fallback."""
    import jax
    import jax.numpy as jnp
    from supir_tpu.ops.quantize import (
        int4_matmul, int4_paired_matmul, quantize_int4,
        quantize_int4_paired, unpack_int4, unpack_int4_paired,
    )

    k = jax.random.PRNGKey(11)
    w = jax.random.normal(k, (256, 128), jnp.float32)
    packed, s1 = quantize_int4(w)
    qp, s2 = quantize_int4_paired(w)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    # same dequantized integer grid, different byte layout
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(packed)), np.asarray(unpack_int4_paired(qp))
    )
    x = jax.random.normal(jax.random.PRNGKey(12), (4, 256), jnp.float32)
    a = int4_matmul(x, packed, s1)
    b = int4_paired_matmul(x, qp, s2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-4)


def test_int4_paired_nibble_order():
    """Byte i must pack row 2i in the LOW nibble and row 2i+1 in the HIGH
    nibble — the exact in-register order pltpu.bitcast(., int4) reads on
    TPU (verified on hardware by tools/bitcast_probe.py)."""
    import jax.numpy as jnp
    from supir_tpu.ops.quantize import quantize_int4_paired

    # absmax 7 -> scale 1 -> quantized values are exactly the inputs
    w = jnp.asarray([[1.0], [-2.0], [3.0], [-7.0]], jnp.float32)
    qp, scale = quantize_int4_paired(w)
    assert float(scale[0, 0]) == 1.0
    b = np.asarray(qp)
    assert b.shape == (2, 1)
    assert b[0, 0] & 0xF == 1          # row 0 -> low nibble of byte 0
    assert (b[0, 0] >> 4) == (-2) & 0xF  # row 1 -> high nibble of byte 0
    assert b[1, 0] & 0xF == 3
    assert (b[1, 0] >> 4) == (-7) & 0xF


def test_int4_paired_dense_decode_identity():
    """int4_paired decode == half-split decode (same grid) on the tiny
    captioner: the layout is a pure byte-order change."""
    import dataclasses as dc

    from supir_tpu.captioner.agent import CaptionerAgent, CaptionerConfig
    from supir_tpu.captioner.llama import quantize_llama_params

    cfg = CaptionerConfig.tiny()
    agent = CaptionerAgent.create_random(cfg)
    img = np.random.default_rng(3).integers(
        0, 255, (cfg.vision.image_size, cfg.vision.image_size, 3), dtype=np.uint8
    )
    caps = {}
    for paired in (False, True):
        qp, _ = quantize_llama_params(
            agent.params["llama"], bits=4, fuse=True, paired=paired)
        leaf = qp["model"]["layer_0"]["qkv_proj"]
        assert ("qp" in leaf) == paired
        a = CaptionerAgent(
            dc.replace(cfg, llama=dc.replace(
                cfg.llama, quantize_int4=True, fused_qkv=True,
                int4_paired=paired)),
            dict(agent.params, llama=qp),
        )
        caps[paired] = a.gen_image_caption([img], temperature=0.0)[0]
    assert caps[True] == caps[False]


def test_int4_w4a8_matches_emulation():
    """int4_w4a8_matmul == exact integer-math emulation (the int8xint4
    int32 accumulation is exact, so only the final fp32 scale multiplies
    can differ) and stays within quantization-error distance of the float
    paired matmul."""
    import jax
    import jax.numpy as jnp
    from supir_tpu.ops.quantize import (
        int4_paired_matmul, int4_w4a8_matmul, quantize_act_int8,
        quantize_int4_paired, unpack_int4_paired,
    )

    k = jax.random.PRNGKey(21)
    w = jax.random.normal(k, (256, 128), jnp.float32)
    qp, s = quantize_int4_paired(w)
    x = jax.random.normal(jax.random.PRNGKey(22), (3, 256), jnp.float32)

    got = np.asarray(int4_w4a8_matmul(x, qp, s))

    xq, xs = quantize_act_int8(x)
    acc = np.asarray(xq, np.int64) @ np.asarray(unpack_int4_paired(qp), np.int64)
    want = acc.astype(np.float64) * np.asarray(s) * np.asarray(xs) / 127.0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    # close to the float-activation paired result (activation rounding only)
    ref = np.asarray(int4_paired_matmul(x, qp, s))
    denom = np.abs(ref).mean() + 1e-9
    assert np.abs(got - ref).mean() / denom < 0.02


def test_w4a8_dense_decode_smoke():
    """act_int8 execution mode decodes deterministic finite tokens through
    the tiny captioner using the SAME 'qp' params as the float-activation
    paired mode."""
    import dataclasses as dc

    from supir_tpu.captioner.agent import CaptionerAgent, CaptionerConfig
    from supir_tpu.captioner.llama import quantize_llama_params

    cfg = CaptionerConfig.tiny()
    agent = CaptionerAgent.create_random(cfg)
    img = np.random.default_rng(5).integers(
        0, 255, (cfg.vision.image_size, cfg.vision.image_size, 3), dtype=np.uint8
    )
    qp, _ = quantize_llama_params(agent.params["llama"], bits=4, fuse=True)
    caps = []
    for _ in range(2):
        a = CaptionerAgent(
            dc.replace(cfg, llama=dc.replace(
                cfg.llama, quantize_int4=True, fused_qkv=True,
                int4_paired=True, act_int8=True)),
            dict(agent.params, llama=qp),
        )
        caps.append(a.gen_image_caption([img], temperature=0.0)[0])
    assert caps[0] == caps[1]
    assert isinstance(caps[0], str)


def test_int4_paired_fused_matmul_composes():
    """int4_paired_fused_matmul (norm/siluglu prologue, residual epilogue,
    W4A8) == the op-by-op composition it replaces, exactly on the fp32
    fallback path."""
    import jax
    import jax.numpy as jnp
    from supir_tpu.ops.quantize import (
        int4_paired_fused_matmul, int4_paired_matmul, int4_w4a8_matmul,
        quantize_int4_paired,
    )

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(31), 4)
    cin, cout = 256, 128
    w = jax.random.normal(k1, (cin, cout), jnp.float32)
    qp, s = quantize_int4_paired(w)
    x = jax.random.normal(k2, (4, cin), jnp.float32)
    gamma = jax.random.normal(k3, (cin,), jnp.float32)
    res = jax.random.normal(k4, (4, cout), jnp.float32)
    eps = 1e-6

    # RMSNorm prologue + residual epilogue
    xn = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    want = int4_paired_matmul(xn * gamma, qp, s) + res
    got = int4_paired_fused_matmul(x, qp, s, gamma=gamma, eps=eps, residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    # SiLU-GLU prologue (input [B, 2*cin])
    x2 = jax.random.normal(k2, (4, 2 * cin), jnp.float32)
    a, bpart = x2[:, :cin], x2[:, cin:]
    want = int4_paired_matmul(jax.nn.silu(a) * bpart, qp, s)
    got = int4_paired_fused_matmul(x2, qp, s, siluglu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    # W4A8 body with norm prologue
    want = int4_w4a8_matmul(xn * gamma, qp, s)
    got = int4_paired_fused_matmul(x, qp, s, gamma=gamma, eps=eps, act_int8=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_fused_glue_decode_identical():
    """fused_glue=True (glue folded into the GEMV kernels) must decode the
    SAME tokens as the module path on CPU — the fp32 fallback math is
    op-for-op identical — with an identical param tree."""
    import dataclasses as dc

    import jax
    from supir_tpu.captioner.agent import CaptionerAgent, CaptionerConfig
    from supir_tpu.captioner.llama import quantize_llama_params

    cfg = CaptionerConfig.tiny()
    agent = CaptionerAgent.create_random(cfg)
    img = np.random.default_rng(7).integers(
        0, 255, (cfg.vision.image_size, cfg.vision.image_size, 3), dtype=np.uint8
    )
    qp, _ = quantize_llama_params(agent.params["llama"], bits=4, fuse=True)
    caps = {}
    for fused in (False, True):
        a = CaptionerAgent(
            dc.replace(cfg, llama=dc.replace(
                cfg.llama, quantize_int4=True, fused_qkv=True,
                int4_paired=True, fused_glue=fused)),
            dict(agent.params, llama=qp),
        )
        caps[fused] = a.gen_image_caption([img], temperature=0.0)[0]
    assert caps[True] == caps[False]

    # identical param trees: init under both modes yields the same paths
    from supir_tpu.captioner.llama import LlamaConfig, LlamaForCausalLM
    import jax.numpy as jnp

    trees = {}
    for fused in (False, True):
        lcfg = dc.replace(
            LlamaConfig().tiny(), quantize_int4=True, fused_qkv=True,
            int4_paired=True, fused_glue=fused)
        m = LlamaForCausalLM(lcfg)
        ids = jnp.zeros((1, 4), jnp.int32)
        pos = jnp.zeros((1, 4), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), ids, pos,
                           method=m.forward_ids)
        trees[fused] = jax.tree_util.tree_structure(variables["params"])
    assert trees[True] == trees[False]


def test_head_int8_logits_close():
    """head_int8 (int8 per-out-channel lm_head) keeps logits within
    quantization tolerance of the fp head and decodes deterministically."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    from supir_tpu.captioner.llama import (
        LlamaConfig, LlamaForCausalLM, quantize_llama_params)

    cfg = LlamaConfig().tiny()
    model = LlamaForCausalLM(cfg)
    rng = jax.random.PRNGKey(9)
    ids = jax.random.randint(rng, (1, 8), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    params = model.init(rng, ids, pos, method=model.forward_ids)["params"]
    # random head kernel (init is zeros-ish otherwise)
    params = dict(params)
    params["lm_head"] = {"Dense_0": {"kernel": jax.random.normal(
        jax.random.PRNGKey(10),
        params["lm_head"]["Dense_0"]["kernel"].shape, jnp.float32) * 0.05}}
    logits, _ = model.apply({"params": params}, ids, pos,
                            method=model.forward_ids)

    qp, _ = quantize_llama_params(params, bits=4, fuse=True, head_int8=True)
    assert set(qp["lm_head"].keys()) == {"q", "scale"}
    qmodel = LlamaForCausalLM(dc.replace(
        cfg, quantize_int4=True, fused_qkv=True, head_int8=True))
    qlogits, _ = qmodel.apply({"params": qp}, ids, pos,
                              method=qmodel.forward_ids)
    scale = float(np.abs(np.asarray(logits)).max()) + 1e-9
    # block weights are int4-quantized too; the head adds <=1/254 relative
    np.testing.assert_allclose(
        np.asarray(qlogits), np.asarray(logits), atol=0.35 * scale)
    # and the head quantization itself perturbs argmax rarely on spread logits
    assert qlogits.shape == logits.shape


def test_int4_native_matches_packed():
    """quantize_int4_native (jnp.int4 layout) must produce the same value
    grid as quantize_int4 and the same matmul result through the XLA
    fallback path."""
    import jax
    import jax.numpy as jnp
    from supir_tpu.ops.quantize import (
        int4_matmul, int4_native_matmul, quantize_int4,
        quantize_int4_native, unpack_int4,
    )

    k = jax.random.PRNGKey(7)
    w = jax.random.normal(k, (256, 128), jnp.float32)
    packed, s1 = quantize_int4(w)
    qn, s2 = quantize_int4_native(w)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(packed)), np.asarray(qn, np.int8)
    )
    x = jax.random.normal(jax.random.PRNGKey(8), (4, 256), jnp.float32)
    a = int4_matmul(x, packed, s1)
    b = int4_native_matmul(x, qn, s2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-4)
