"""Condensed-elimination tests: plan structure, host-oracle agreement
with both np.linalg.solve and the full static schedule, the fused
constants' reduced layout invariants, and cross-solver tracker parity."""

import dataclasses

import numpy as np
import pytest

from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import (
    fused,
    ransac,
    reduce as red,
    schedule as sched,
)
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils import data_io
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
    ransac_data_dir,
)


@pytest.fixture(scope="module")
def hc(cfg):
    return dataclasses.replace(cfg.hc, max_steps=12)


@pytest.fixture(scope="module")
def workload(cfg, problem):
    view = data_io.load_ransac_view(ransac_data_dir(cfg), 0)
    samples = ransac.sample_edgel_triplets(
        0, view.edge_locations.shape[0], 1
    )
    tgt = ransac.build_target_params(
        view.edge_locations, view.edge_tangents, samples
    )
    tgt_b = np.repeat(tgt, 96, axis=0)
    diff_b = tgt_b - problem.start_params
    x0 = np.asarray(problem.start_sols)[:96]
    return x0, tgt_b, diff_b


@pytest.fixture(scope="module")
def pattern(problem):
    f = problem.factored
    n = problem.num_vars
    return f.hx_scatter.reshape(n, n) != f.hx_C.shape[1]


@pytest.fixture(scope="module")
def plan(pattern):
    p = red.build_reduction(pattern)
    assert p is not None
    return p


def test_plan_structure(plan):
    """The trifocal pattern condenses into 6 depth triples, 4 quads and
    2 pairs (16 pivots in 3 batched stages) over a 14-step reduced
    schedule -- the structure the kernel metadata is built for."""
    shapes = sorted(
        (f.level, f.g, f.l, len(f.groups)) for f in plan.families
    )
    assert shapes == [(0, 3, 1, 6), (0, 3, 2, 4), (1, 2, 1, 2)]
    assert plan.schedule.n == 14
    assert plan.num_group_pivots + plan.schedule.n == plan.n == 30
    # Reduced windows shrink to <=14 rows (vs 30 in the full schedule).
    assert max(len(st.rows) for st in plan.schedule.steps) == 14


def test_solve_matches_lapack_and_schedule(plan, pattern):
    """reduce.solve_numpy == np.linalg.solve on well-conditioned systems
    and == schedule.solve_numpy to summation-order noise: the condensed
    path keeps the full schedule's pivot choices (module doc)."""
    n = pattern.shape[0]
    s_full = sched.build_schedule(pattern)
    rng = np.random.default_rng(0)
    for trial in range(50):
        vals = rng.standard_normal(pattern.sum()) \
            + 1j * rng.standard_normal(pattern.sum())
        if trial % 4 == 1:
            vals *= 10.0 ** rng.uniform(-4, 4, pattern.sum())
        a = np.zeros((n, n), complex)
        a[pattern] = vals
        b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        x_red = red.solve_numpy(plan, a, b)
        x_sch = sched.solve_numpy(s_full, a, b)
        np.testing.assert_allclose(x_red, x_sch, rtol=1e-8, atol=1e-10)
        if np.linalg.cond(a) < 1e8:
            np.testing.assert_allclose(
                x_red, np.linalg.solve(a, b), rtol=1e-6, atol=1e-9
            )


def test_reduced_layout_invariants(problem):
    c = fused.FusedConstants.build(problem, solver="reduced")
    assert c.reduced is not None
    meta = c.reduced
    n = len(c.perm)
    assert meta.col_off % 8 == 0
    assert meta.col_off + meta.n2 == n
    # Save slots partition [0, n): families then reduced steps.
    slots = []
    for fam in meta.fams:
        slots.extend(range(fam.base, fam.base + fam.l * fam.nG))
        # The iota-diagonal invariant: step k's local columns occupy
        # positions base + k*nG + q.
        for k in range(fam.l):
            for q in range(fam.nG):
                p = fam.base + k * fam.nG + q
                assert fam.blk[0] <= p < fam.blk[1]
    slots.extend(range(meta.col_off, meta.col_off + meta.n2))
    assert sorted(slots) == list(range(n))
    # Every final row is written exactly once by some family's out_runs.
    written = []
    for fam in meta.fams:
        if fam.out_runs is not None:
            for runs in fam.out_runs:
                for lo, hi, _src in runs:
                    written.extend(range(lo, hi))
    assert sorted(written) == list(range(meta.n2))
    # The schedule fallback builds the original layout.
    c2 = fused.FusedConstants.build(problem, solver="schedule")
    assert c2.reduced is None and len(c2.steps) == n


@pytest.mark.slow
@pytest.mark.parametrize("solver", ["reduced", "schedule"])
def test_resolve_rhs_replays_factorization(problem, solver):
    """Saved-factorization rhs replay == direct solve (both solvers).

    The replay path (_resolve_rhs / _reduce_resolve_rhs, used by the
    modified-Newton corrector and frozen-Jacobian RK strategies) applies
    the identical pivot one-hots / multipliers to the rhs vector alone,
    so on the SAME rhs it must reproduce the direct solve to rounding
    noise, and on a doubled rhs it must scale exactly (elimination is
    linear in the rhs; x2 is exponent arithmetic, no rounding).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import (
        eval as ev,
    )

    c = fused.FusedConstants.build(problem, solver=solver)
    assert (c.reduced is not None) == (solver == "reduced")
    T, n, width = 8, 30, 32
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((T, n))
         + 1j * rng.standard_normal((T, n))).astype(np.complex64)
    tval = 0.43
    tgt = (rng.standard_normal((T, 34))
           + 1j * rng.standard_normal((T, 34))).astype(np.complex64)
    tgt[:, 33] = 1.0
    diff = tgt - problem.start_params

    p = ev.param_homotopy(
        jnp.full((T,), tval, jnp.float32), problem.start_params,
        jnp.asarray(tgt),
    )
    hx_o, h_o, _ = ev.eval_all_factored(
        problem, jnp.asarray(x), p, jnp.asarray(diff),
        need_h=True, need_ht=False,
    )
    dx_o = np.stack([
        np.linalg.solve(np.asarray(hx_o)[i], np.asarray(h_o)[i])
        for i in range(T)
    ])

    perm = np.asarray(c.perm)

    def kernel(xr, xi, apr, api, bpr, bpi, cpr, cpi,
               ohx23, ohx2g, ohx3g, ohq23, chx, cht, chtneg,
               dx1r, dx1i, dx2r, dx2i, dx3r, dx3i,
               m_sc, sv_re, sv_im, used, xe_re, xe_im, agq, P,
               foh, ffr, ffi, rr_re, rr_im):
        consts = (ohx23[:], ohx2g[:], ohx3g[:], chx[:], cht[:], chtneg[:])
        for i, (a, b) in enumerate(((apr, api), (bpr, bpi), (cpr, cpi))):
            wide = jnp.concatenate([a[:], b[:]], axis=1)
            agq[i] = fused._dot(ohq23[:], wide)
        ones = jnp.ones((1, T), jnp.float32)
        zeros = jnp.zeros((1, T), jnp.float32)
        xp_w = jnp.concatenate(
            [jnp.concatenate([xr[:], ones], 0),
             jnp.concatenate([xi[:], zeros], 0)], axis=1
        )
        t_w = jnp.full((1, 2 * T), tval, jnp.float32)
        fused._fill_P(c, P, agq, t_w, rk=False)
        hx, h = fused._eval_core(c, consts, P[:], xp_w, T, want_h=True)
        fused._assemble(c, m_sc, hx, h, T)
        dr, di = fused._solve(
            c, m_sc, sv_re, sv_im, used, xe_re, xe_im, T,
            save=(foh, ffr, ffi),
        )
        dx1r[:] = dr
        dx1i[:] = di
        replay = (fused._reduce_resolve_rhs if c.reduced is not None
                  else fused._resolve_rhs)
        dr2, di2 = replay(c, sv_re, sv_im, foh, ffr, ffi, rr_re, rr_im,
                          xe_re, xe_im, h, T)
        dx2r[:] = dr2
        dx2i[:] = di2
        dr3, di3 = replay(c, sv_re, sv_im, foh, ffr, ffi, rr_re, rr_im,
                          xe_re, xe_im, 2.0 * h, T)
        dx3r[:] = dr3
        dx3i[:] = di3

    coefs = fused.build_pair_coefs(
        problem, jnp.asarray(diff.real), jnp.asarray(diff.imag), T
    )
    xb = x.T[perm]
    gc = [jnp.asarray(a) for a in (
        c.ohx23, c.ohx2g, c.ohx3g, c.ohq23, c.chx, c.cht, c.chtneg)]
    outs = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, T), jnp.float32),) * 6,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 15,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 6,
        scratch_shapes=[
            pltpu.VMEM((n, width, 2 * T), jnp.float32),
            pltpu.VMEM((n, width, T), jnp.float32),
            pltpu.VMEM((n, width, T), jnp.float32),
            pltpu.VMEM((n, T), jnp.float32),
            pltpu.VMEM((width, T), jnp.float32),
            pltpu.VMEM((width, T), jnp.float32),
            pltpu.VMEM((3, c.kp, 2 * T), jnp.float32),
            pltpu.VMEM((c.kp, 2 * T), jnp.float32),
            pltpu.VMEM((n, n, T), jnp.float32),
            pltpu.VMEM((n, n, T), jnp.float32),
            pltpu.VMEM((n, n, T), jnp.float32),
            pltpu.VMEM((n, T), jnp.float32),
            pltpu.VMEM((n, T), jnp.float32),
        ],
        interpret=True,
    )(xb.real.astype(np.float32), xb.imag.astype(np.float32), *coefs, *gc)
    inv = np.argsort(perm)
    dx1 = (np.asarray(outs[0]) + 1j * np.asarray(outs[1]))[inv].T
    dx2 = (np.asarray(outs[2]) + 1j * np.asarray(outs[3]))[inv].T
    dx3 = (np.asarray(outs[4]) + 1j * np.asarray(outs[5]))[inv].T
    # Direct solve is valid against the dense oracle.
    np.testing.assert_allclose(dx1, dx_o, rtol=2e-3, atol=2e-4)
    # Replay of the same rhs: identical pivots/multipliers and update
    # arithmetic, but XLA contracts/fuses the 3D forward vs the 2D
    # replay graphs differently (no bit-reproducibility contract across
    # restructured graphs -- same class as the eval_structure variants),
    # measured ~1e-5 relative on the reduced path.
    np.testing.assert_allclose(dx2, dx1, rtol=1e-4, atol=1e-6)
    # Linearity: doubled rhs -> doubled solution.  Would be bitwise for
    # a fixed op DAG (every replay intermediate is homogeneous degree 1
    # in the rhs and x2 is exponent arithmetic), but XLA fuses the two
    # inline replay expansions differently on the reduced path (~2e-6
    # relative measured); the check still catches structural replay
    # bugs (stale rows, wrong one-hots), which are O(1) errors.
    np.testing.assert_allclose(dx3, 2.0 * dx2, rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_cross_solver_tracker_parity(problem, hc, workload):
    """Reduced and schedule fused kernels agree path-for-path (interpret
    mode, plain f32): same pivots and update arithmetic, only backsub
    summation order differs -- flags must match on the test workload."""
    x0, tgt_b, diff_b = workload
    hc_r = dataclasses.replace(hc, solver="reduced")
    hc_s = dataclasses.replace(hc, solver="schedule")
    rr = fused.make_track_fn(problem, hc_r, interpret=True)(
        x0, tgt_b, diff_b
    )
    rs = fused.make_track_fn(problem, hc_s, interpret=True)(
        x0, tgt_b, diff_b
    )
    assert (rr.num_steps == rs.num_steps).all()
    assert (rr.converged == rs.converged).all()
    assert (rr.pruned == rs.pruned).all()
    # x is mid-trajectory at 12 steps: the only arithmetic difference
    # (backsub summation order, ~1 ulp/solve) amplifies through the
    # chaotic path dynamics, so the value band is loose; the exact
    # flag/step equality above is the real gate (converged-path x agreed
    # to 1.1e-5 in a 40-step convergence run).
    live = ~rr.pruned & ~rr.inf_fail
    assert live.any()
    rel = np.abs(rr.x[live] - rs.x[live]).max() / np.abs(rs.x[live]).max()
    assert rel < 5e-2
