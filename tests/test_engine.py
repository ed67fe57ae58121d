"""Engine-level smoke tests on the CPU backend (xla oracle tracker)."""

import dataclasses

import numpy as np
import pytest

from trifocal_pose_estimation_using_improved_gpuhc_tpu.engine import (
    TrifocalPoseEngine,
)


@pytest.fixture(scope="module")
def engine(cfg):
    # Keep CPU cost small: few steps are enough to exercise the whole
    # pipeline (tracking, gating, scoring, selection); convergence is not
    # required for the plumbing to work.
    small = dataclasses.replace(
        cfg, hc=dataclasses.replace(cfg.hc, max_steps=25)
    )
    return TrifocalPoseEngine(small)


def test_run_round_pipeline(engine):
    view = engine.load_view(0)
    rr = engine.run_round(view, seed=0, num_hypotheses=2)
    assert rr.num_edgels == view.edge_locations.shape[0]
    assert rr.stats.num_paths == 2 * engine.problem.num_tracks
    assert rr.track_ms > 0
    assert rr.num_steps.shape == (2 * engine.problem.num_tracks,)


def test_run_stream_matches_run_round(engine):
    view = engine.load_view(0)
    rr = engine.run_round(view, seed=0, num_hypotheses=2)
    results, vps = engine.run_stream([0, 1], num_hypotheses=2)
    assert len(results) == 2 and vps > 0
    # View 0 streamed with the same seed reproduces the serial round.
    assert results[0].stats.num_converged == rr.stats.num_converged
    assert results[0].num_candidates == rr.num_candidates
    assert results[0].best_support21 == rr.best_support21
