"""Captioner converter: bijective coverage vs the randomly-initialized
captioner tree (same inverse-walk technique as the SUPIR converter test)."""

import numpy as np

from supir_tpu.captioner.agent import CaptionerAgent, CaptionerConfig
from supir_tpu.captioner import convert as CC
from supir_tpu.utils.ckpt import ConversionReport, apply_rules
from tests.test_ckpt_converter import _fake_torch_sd_from_flax, _flatten


def test_captioner_converter_roundtrip():
    cfg = CaptionerConfig.tiny()
    agent = CaptionerAgent.create_random(cfg)
    params = agent.params

    rule_sets = {
        "llama": CC.llama_rules(cfg.llama),
        "vision": CC.vision_rules(cfg.vision),
        "projector": CC.projector_rules(),
    }
    sd = {}
    for branch, rules in rule_sets.items():
        sd.update(_fake_torch_sd_from_flax(rules, _flatten(params[branch])))

    converted, report = CC.convert_captioner_state_dict(sd, cfg)
    assert not report.missing, report.missing[:8]
    assert not report.unused, report.unused[:8]
    for branch in rule_sets:
        got = _flatten(converted[branch])
        want = _flatten(params[branch])
        assert set(got) == set(want), (
            f"{branch}: extra={sorted(set(got)-set(want))[:4]} "
            f"missing={sorted(set(want)-set(got))[:4]}"
        )
        for k in want:
            assert got[k].shape == want[k].shape, (branch, k)
            np.testing.assert_array_equal(got[k], want[k], err_msg=str(k))
