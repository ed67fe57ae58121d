"""Config-tier tests: env overrides used by the TPU measurement campaign."""

import dataclasses

from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
    HCConfig,
)


def test_eval_structure_env_override(monkeypatch):
    """TPUHC_EVAL_STRUCTURE overrides the default eval_structure.

    Campaign tooling (tools/reconcile_stats.py, bench.py) A/Bs evaluator
    structures through this env var without touching code; explicit
    construction and dataclasses.replace must still win over it.
    """
    assert HCConfig().eval_structure == "classic"
    monkeypatch.setenv("TPUHC_EVAL_STRUCTURE", "gathered")
    assert HCConfig().eval_structure == "gathered"
    assert HCConfig(eval_structure="merged").eval_structure == "merged"
    h = dataclasses.replace(HCConfig(), tile=256)
    assert h.eval_structure == "gathered"  # replace re-reads nothing
    monkeypatch.delenv("TPUHC_EVAL_STRUCTURE")
    assert HCConfig().eval_structure == "classic"
