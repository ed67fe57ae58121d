"""Monodromy start-system generation (D4 equivalent) on the CPU oracle."""

import dataclasses
import os

import numpy as np
import pytest

from trifocal_pose_estimation_using_improved_gpuhc_tpu.models import monodromy
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import tracker


def test_refiner_polishes_shipped_roots(problem, cfg):
    refine = monodromy.make_refiner(problem, batch=32)
    x = np.asarray(problem.start_sols)[:16]
    xr, res = refine(x, np.asarray(problem.start_params))
    # Shipped roots are true roots: residuals tiny, polish is a no-op.
    assert res.max() < 1e-3
    assert np.abs(xr - x).max() < 1e-2


def test_write_start_system_roundtrip(problem, tmp_path):
    res = monodromy.MonodromyResult(
        params=np.asarray(problem.start_params),
        solutions=np.asarray(problem.start_sols)[:5],
        loops_run=0,
        history=[],
    )
    pp = tmp_path / "start_params.txt"
    ps = tmp_path / "start_sols.txt"
    monodromy.write_start_system(str(pp), str(ps), res)
    raw = np.loadtxt(ps)
    sols = (raw[:, 0] + 1j * raw[:, 1]).reshape(5, 30)
    np.testing.assert_allclose(
        sols, np.asarray(problem.start_sols)[:5], rtol=1e-6, atol=1e-7
    )
    raw_p = np.loadtxt(pp)
    np.testing.assert_allclose(
        raw_p[:, 0] + 1j * raw_p[:, 1],
        np.asarray(problem.start_params)[:-1],
        rtol=1e-6,
    )


@pytest.mark.slow
def test_monodromy_discovers_new_roots(problem, cfg):
    hc = dataclasses.replace(cfg.hc, truncate_paths=False)
    track = tracker.make_track_fn(problem, hc, dynamic_start=True)
    seed = np.asarray(problem.start_sols)[:24]
    res = monodromy.monodromy_solve(
        problem, hc, seed_sols=seed, target_count=30, max_loops=3,
        patience=3, rng_seed=2, track_fn=track, leg_batch=32,
    )
    assert res.solutions.shape[0] > 24, res.history
    # Every discovered root must be a true root of the shipped start set.
    ship = np.asarray(problem.start_sols)
    for s in res.solutions:
        assert np.min(np.max(np.abs(ship - s[None]), axis=1)) < 1e-2
