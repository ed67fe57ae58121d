"""Structured-solve schedule: symbolic analysis + numeric executor tests."""

import numpy as np
import pytest

from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import schedule as sch


def _trifocal_pattern(problem):
    f = problem.factored
    n = problem.num_vars
    return f.hx_scatter.reshape(n, n) != f.hx_C.shape[1]


def test_schedule_covers_all_columns(problem):
    s = sch.build_schedule(_trifocal_pattern(problem))
    assert sorted(st.col for st in s.steps) == list(range(30))
    for st in s.steps:
        assert st.col in st.cols
        assert s.rhs_col in st.cols


def test_schedule_beats_dense_volume(problem):
    s = sch.build_schedule(_trifocal_pattern(problem))
    d = sch.dense_schedule(30)
    # The trifocal Jacobian is 170/900 sparse; the static schedule must cut
    # elimination volume by a large factor (observed ~11.7x).
    assert s.update_volume * 5 < d.update_volume


@pytest.mark.parametrize("trial", range(5))
def test_structured_solve_matches_dense(problem, trial):
    pat = _trifocal_pattern(problem)
    s = sch.build_schedule(pat)
    rng = np.random.default_rng(trial)
    a = np.where(
        pat,
        rng.standard_normal((30, 30)) + 1j * rng.standard_normal((30, 30)),
        0.0,
    )
    b = rng.standard_normal(30) + 1j * rng.standard_normal(30)
    x = sch.solve_numpy(s, a, b)
    np.testing.assert_allclose(x, np.linalg.solve(a, b), rtol=1e-9, atol=1e-10)


def test_dense_schedule_solves_dense_matrix():
    s = sch.dense_schedule(12)
    rng = np.random.default_rng(7)
    a = rng.standard_normal((12, 12)) + 1j * rng.standard_normal((12, 12))
    b = rng.standard_normal(12) + 1j * rng.standard_normal(12)
    np.testing.assert_allclose(
        sch.solve_numpy(s, a, b), np.linalg.solve(a, b), rtol=1e-9, atol=1e-10
    )


def test_structured_solve_random_patterns():
    rng = np.random.default_rng(3)
    for _ in range(3):
        n = 10
        # random sparse pattern + dense diagonal to keep it nonsingular
        pat = rng.random((n, n)) < 0.25
        np.fill_diagonal(pat, True)
        a = np.where(
            pat, rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)), 0
        )
        b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        s = sch.build_schedule(pat)
        np.testing.assert_allclose(
            sch.solve_numpy(s, a, b), np.linalg.solve(a, b),
            rtol=1e-8, atol=1e-9,
        )


def test_structured_solve_ill_conditioned(problem):
    """End-zone-like systems: restricted pivoting stays stable.

    The HC end zone (t -> 1) drives the Jacobian toward singularity; the
    static schedule must degrade like dense partial pivoting, not blow up.
    """
    pat = _trifocal_pattern(problem)
    s = sch.build_schedule(pat)
    rng = np.random.default_rng(11)
    for scale in (1e-4, 1e-6):
        a = np.where(
            pat,
            rng.standard_normal((30, 30)) + 1j * rng.standard_normal((30, 30)),
            0.0,
        )
        # Make one pivot group nearly dependent (rank-deficient direction).
        a[1] = a[0] * (1.0 + scale) + scale * (
            rng.standard_normal(30) * pat[1]
        )
        a = np.where(pat & (np.abs(a) > 0), a, np.where(pat, scale, 0))
        b = rng.standard_normal(30) + 1j * rng.standard_normal(30)
        x = sch.solve_numpy(s, a, b)
        # Compare residuals, not solutions: both solvers face the same
        # conditioning; the schedule must not be categorically worse.
        r_struct = np.abs(a @ x - b).max()
        x_np = np.linalg.solve(a, b)
        r_np = np.abs(a @ x_np - b).max()
        assert r_struct < max(1e3 * r_np, 1e-6), (scale, r_struct, r_np)
