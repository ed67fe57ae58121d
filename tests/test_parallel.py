"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np

from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import ransac, tracker
from trifocal_pose_estimation_using_improved_gpuhc_tpu.parallel import mesh as pmesh
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils import data_io
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
    ransac_data_dir,
)
import dataclasses


def test_sharded_track_matches_single_device(cfg, problem):
    import jax

    assert len(jax.devices()) == 8
    hc = dataclasses.replace(cfg.hc, max_steps=12)  # keep CPU runtime small
    view = data_io.load_ransac_view(ransac_data_dir(cfg), 0)
    H, T = 8, 16  # 8 hypotheses (1 per device) x 16 paths
    samples = ransac.sample_edgel_triplets(3, view.edge_locations.shape[0], H)
    tgt = ransac.build_target_params(view.edge_locations, view.edge_tangents, samples)
    tgt_b = np.repeat(tgt, T, axis=0)
    diff_b = tgt_b - np.asarray(problem.start_params)
    x0 = np.tile(np.asarray(problem.start_sols)[:T], (H, 1))

    single = tracker.make_track_fn(problem, hc)
    r_single = single(x0, tgt_b, diff_b)

    m = pmesh.make_mesh(8)
    sharded = pmesh.make_sharded_track_fn(problem, hc, m)
    r_shard = sharded(x0, tgt_b, diff_b)

    # Hypothesis sharding is communication-free: flags agree exactly;
    # solutions agree up to f32 reassociation noise (different program
    # partitioning reorders reductions). Non-converged paths hold garbage
    # (diverged/rolled-back state), so compare converged ones only.
    np.testing.assert_array_equal(r_single.converged, r_shard.converged)
    np.testing.assert_array_equal(r_single.pruned, r_shard.pruned)
    conv = r_single.converged
    np.testing.assert_allclose(
        r_single.x[conv], r_shard.x[conv], rtol=5e-3, atol=5e-4
    )
