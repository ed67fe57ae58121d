"""P2C ablation evaluator: derived coefficient conversion vs PH (exact)."""

import numpy as np
import pytest

from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import eval as ev
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import p2c
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
    problem_dir,
)


@pytest.fixture(scope="module")
def p2c_tables(problem, cfg):
    return p2c.derive_coeff_map(problem, problem_dir(cfg), samples=60)


def test_p2c_matches_ph_evaluation(problem, cfg, p2c_tables):
    import jax.numpy as jnp

    evalf = p2c.make_p2c_evaluator(problem, p2c_tables)
    rng = np.random.default_rng(99)
    B = 4
    x = (rng.standard_normal((B, 30)) + 1j * rng.standard_normal((B, 30))).astype(
        np.complex64
    )
    start = np.asarray(problem.start_params)
    tgt = (rng.standard_normal((B, 34)) + 1j * rng.standard_normal((B, 34))).astype(
        np.complex64
    )
    tgt[:, 33] = 1.0
    t = rng.uniform(0.1, 0.9, B).astype(np.float32)

    hx1, h1, mht1 = evalf(
        jnp.asarray(x), jnp.asarray(start), jnp.asarray(tgt), jnp.asarray(t)
    )
    p_t = ev.param_homotopy(jnp.asarray(t), start, jnp.asarray(tgt))
    diff = jnp.asarray(tgt) - start
    np.testing.assert_allclose(
        np.asarray(hx1), np.asarray(ev.eval_Hx_direct(problem, x, p_t)),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(h1), np.asarray(ev.eval_H_direct(problem, x, p_t)),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(mht1),
        np.asarray(ev.eval_minus_Ht_direct(problem, x, p_t, diff)),
        rtol=1e-4, atol=1e-4,
    )


def test_p2c_rejects_wrong_tables(problem, cfg, tmp_path):
    """The derivation self-validates: corrupted tables must be detected."""
    import os
    import shutil

    src = problem_dir(cfg)
    for f in ("dHdx_indx_P2C.txt", "dHdt_indx_P2C.txt"):
        shutil.copy(os.path.join(src, f), tmp_path / f)
    # Corrupt a coefficient index column.
    raw = np.loadtxt(tmp_path / "dHdx_indx_P2C.txt", dtype=np.int64)
    flat = raw.reshape(30, 30, 8, 4)
    flat[:, :, :, 1] = (flat[:, :, :, 1] + 7) % 38
    np.savetxt(tmp_path / "dHdx_indx_P2C.txt", flat.reshape(raw.shape), fmt="%d")
    with pytest.raises(ValueError, match="table interpretation mismatch"):
        p2c.derive_coeff_map(problem, str(tmp_path), samples=8)


@pytest.mark.slow
def test_p2c_fused_tracking_matches_ph(cfg, problem, p2c_tables):
    """The P2C variant on the production fused kernel tracks like PH.

    Identical homotopy expressed through the coefficient tables, so step
    counts agree up to threshold-level float noise."""
    import dataclasses

    from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import (
        p2c as p2c_mod,
        ransac,
        tracker,
    )
    from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils import data_io
    from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
        ransac_data_dir,
    )

    view = data_io.load_ransac_view(ransac_data_dir(cfg), 0)
    T = 32
    samples = ransac.sample_edgel_triplets(0, view.edge_locations.shape[0], 1)
    tgt = ransac.build_target_params(
        view.edge_locations, view.edge_tangents, samples
    )
    tgt_b = np.repeat(tgt, T, axis=0)
    diff_b = tgt_b - np.asarray(problem.start_params)
    x0 = np.asarray(problem.start_sols)[:T]
    hc = dataclasses.replace(cfg.hc, max_steps=12)

    ro = tracker.make_track_fn(problem, hc)(x0, tgt_b, diff_b)
    tr = p2c_mod.make_fused_p2c_track_fn(
        problem, p2c_tables, hc, tile=32, interpret=True
    )
    rp = tr(x0, tgt_b, diff_b)
    assert (rp.num_steps == ro.num_steps).mean() >= 0.95
    assert (rp.pruned == ro.pruned).mean() >= 0.95
