"""Property tests for the HC path tracker (SURVEY.md section 4 test plan)."""

import numpy as np
import jax.numpy as jnp

from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import eval as ev
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import ransac, tracker
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils import data_io
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
    ransac_data_dir,
)


def _one_hypothesis_targets(cfg, problem, n_paths):
    view = data_io.load_ransac_view(ransac_data_dir(cfg), 0)
    samples = ransac.sample_edgel_triplets(7, view.edge_locations.shape[0], 1)
    tgt = ransac.build_target_params(view.edge_locations, view.edge_tangents, samples)
    tgt_b = np.repeat(tgt, n_paths, axis=0)
    return tgt_b, tgt_b - np.asarray(problem.start_params)


def test_converged_paths_satisfy_target_system(cfg, problem):
    n = 64  # subset of the 312 paths to keep CPU runtime small
    tgt_b, diff_b = _one_hypothesis_targets(cfg, problem, n)
    x0 = np.asarray(problem.start_sols)[:n]
    track = tracker.make_track_fn(problem, cfg.hc)
    res = track(x0, tgt_b, diff_b)

    assert res.converged.any(), "no path converged on a real hypothesis"
    # H(x, t=1) = 0 for converged paths: t=1 means p(t) = target params.
    xc = jnp.asarray(res.x[res.converged])
    p1 = jnp.asarray(tgt_b[: xc.shape[0]])
    h = np.asarray(ev.eval_H_direct(problem, xc, p1))
    # Scale-aware: compare against the homotopy magnitude at the start point.
    assert np.abs(h).max() < 1e-2
    # Flags are mutually consistent.
    assert not (res.converged & res.pruned).any()


def test_tracker_deterministic(cfg, problem):
    n = 16
    tgt_b, diff_b = _one_hypothesis_targets(cfg, problem, n)
    x0 = np.asarray(problem.start_sols)[:n]
    track = tracker.make_track_fn(problem, cfg.hc)
    r1 = track(x0, tgt_b, diff_b)
    r2 = track(x0, tgt_b, diff_b)
    np.testing.assert_array_equal(r1.x, r2.x)
    np.testing.assert_array_equal(r1.converged, r2.converged)
