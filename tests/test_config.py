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


def test_cjr_and_solver_env_overrides(monkeypatch):
    """TPUHC_CJR / TPUHC_SOLVER select the modified-Newton corrector
    (freeze after k full iterations; 0 = off) and the solve machinery
    for campaign A/Bs without code edits."""
    assert HCConfig().corrector_jacobian_reuse == 0
    assert HCConfig().solver == "reduced"
    monkeypatch.setenv("TPUHC_CJR", "2")
    monkeypatch.setenv("TPUHC_SOLVER", "schedule")
    assert HCConfig().corrector_jacobian_reuse == 2
    assert HCConfig().solver == "schedule"
    assert HCConfig(corrector_jacobian_reuse=0,
                    solver="reduced").solver == "reduced"
    monkeypatch.delenv("TPUHC_CJR")
    monkeypatch.delenv("TPUHC_SOLVER")
    assert HCConfig().corrector_jacobian_reuse == 0


def test_segment_and_precision_env_overrides(monkeypatch):
    """TPUHC_SEGMENT_STEPS / TPUHC_EVAL_PRECISION: campaign knobs for the
    segment-length retune and the split-matmul mode.  split3k is the
    shipped default since campaign 13 (see HCConfig.eval_precision)."""
    assert HCConfig().segment_steps == 8
    assert HCConfig().eval_precision == "split3k"
    monkeypatch.setenv("TPUHC_SEGMENT_STEPS", "12")
    monkeypatch.setenv("TPUHC_EVAL_PRECISION", "split3")
    assert HCConfig().segment_steps == 12
    assert HCConfig().eval_precision == "split3"
    assert HCConfig(segment_steps=4).segment_steps == 4
    monkeypatch.delenv("TPUHC_SEGMENT_STEPS")
    monkeypatch.delenv("TPUHC_EVAL_PRECISION")
    assert HCConfig().segment_steps == 8


def test_tile_env_override(monkeypatch):
    """TPUHC_TILE: bench-level tile A/Bs without code edits.  Tile size is
    timing-only (whole-tile early exit / tile-wide corrector skip freeze
    done lanes, never change per-path results), so campaigns A/B it on
    bench arms alone."""
    assert HCConfig().tile == 128
    monkeypatch.setenv("TPUHC_TILE", "64")
    assert HCConfig().tile == 64
    assert HCConfig(tile=256).tile == 256
    monkeypatch.delenv("TPUHC_TILE")
    assert HCConfig().tile == 128


def test_num_of_cores_yaml_key(tmp_path):
    """Num_Of_Cores (gpuhc_settings.yaml:34) is parsed and recorded; the
    CPU oracle's parallelism itself is the XLA CPU runtime's thread pool
    (the OpenMP pool it replaces: CPU_HC_Solver.cpp:232-239)."""
    from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
        load_problem_yaml,
    )

    p = tmp_path / "gpuhc_settings.yaml"
    p.write_text("%YAML:1.0\nNum_Of_Cores: 12\n")
    cfg = load_problem_yaml(str(p))
    assert cfg.num_cpu_cores == 12
    p.write_text("%YAML:1.0\nNum_Of_Vars: 30\n")
    assert load_problem_yaml(str(p)).num_cpu_cores is None
