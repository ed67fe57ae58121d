"""Fused Pallas kernel parity vs the plain-JAX oracle (interpret mode).

The kernel is the production TPU path; on the CPU test backend it runs
through the Pallas interpreter, so these tests validate the kernel MATH
(evaluator, structured solve, step semantics), not Mosaic lowering -- the
TPU compile path is exercised by bench.py / the CLI on hardware.
"""

import dataclasses

import numpy as np
import pytest

from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import (
    fused,
    ransac,
    tracker,
)
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils import data_io
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
    ransac_data_dir,
)

_TR = 32          # paths
_STEPS = 12       # HC steps: enough for depth pruning + dt adaptation paths
_TILE = 32


@pytest.fixture(scope="module")
def workload(cfg, problem):
    view = data_io.load_ransac_view(ransac_data_dir(cfg), 0)
    samples = ransac.sample_edgel_triplets(0, view.edge_locations.shape[0], 1)
    tgt = ransac.build_target_params(
        view.edge_locations, view.edge_tangents, samples
    )
    tgt_b = np.repeat(tgt, _TR, axis=0)
    diff_b = tgt_b - problem.start_params
    x0 = np.asarray(problem.start_sols)[:_TR]
    return x0, tgt_b, diff_b, view


@pytest.fixture(scope="module")
def hc(cfg):
    return dataclasses.replace(cfg.hc, max_steps=_STEPS, segment_steps=4)


def test_tile_guard_sub128_tpu_only(problem, hc):
    """Sub-128 tiles fail fast with a clear error on the TPU (Mosaic)
    path: paths ride the 128-wide lane axis and Mosaic requires lane-dim
    block sizes divisible by 128 (campaign-19 probe: deterministic
    lowering ValueError at TPUHC_TILE=64).  Interpret mode keeps
    accepting small tiles -- the whole CPU test tier relies on that."""
    c = fused.FusedConstants.build(problem)
    with pytest.raises(ValueError, match="multiple of 128"):
        fused.build_kernel_caller(c, problem, hc, 64, 2, interpret=False)
    fused.build_kernel_caller(c, problem, hc, 8, 2, interpret=True)


@pytest.fixture(scope="module")
def oracle_result(problem, hc, workload):
    x0, tgt_b, diff_b, _ = workload
    oracle = tracker.make_track_fn(problem, hc)
    return oracle(x0, tgt_b, diff_b)


def test_eval_solve_against_factored_oracle(problem):
    """One eval+solve inside the kernel == eval_all_factored + np solve."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import eval as ev

    c = fused.FusedConstants.build(problem)
    T, n, width = 8, 30, 32
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((T, n)) + 1j * rng.standard_normal((T, n))).astype(
        np.complex64
    )
    tval = 0.37
    tgt = (rng.standard_normal((T, 34)) + 1j * rng.standard_normal((T, 34))).astype(
        np.complex64
    )
    tgt[:, 33] = 1.0
    diff = tgt - problem.start_params

    # Oracle: factored evaluator + dense numpy solve.
    p = ev.param_homotopy(
        jnp.full((T,), tval, jnp.float32), problem.start_params, jnp.asarray(tgt)
    )
    hx_o, h_o, mht_o = ev.eval_all_factored(
        problem, jnp.asarray(x), p, jnp.asarray(diff), need_h=True, need_ht=True
    )
    k_o = np.stack(
        [np.linalg.solve(np.asarray(hx_o)[i], np.asarray(mht_o)[i]) for i in range(T)]
    )

    # Kernel: one RK-style eval+solve on the same inputs.
    perm = np.asarray(c.perm)

    def kernel(xr, xi, apr, api, bpr, bpi, cpr, cpi,
               ohx23, ohx2g, ohx3g, ohq23, chx, cht, chtneg, dxr_o, dxi_o,
               m_sc, sv_re, sv_im, used, xe_re, xe_im, agq, px, P):
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
        fused._fill_P(c, P, agq, t_w, rk=True)
        hx, mht = fused._eval_core(
            c, consts, P[:], xp_w, T, want_h=False
        )
        fused._assemble(c, m_sc, hx, mht, T)
        dr, di = fused._solve(c, m_sc, sv_re, sv_im, used, xe_re, xe_im, T)
        dxr_o[:] = dr
        dxi_o[:] = di

    coefs = fused.build_pair_coefs(
        problem, jnp.asarray(diff.real), jnp.asarray(diff.imag), T
    )
    xb = x.T[perm]
    gc = [jnp.asarray(a) for a in (
        c.ohx23, c.ohx2g, c.ohx3g, c.ohq23, c.chx, c.cht, c.chtneg)]
    dr, di = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, T), jnp.float32),) * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 15,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        scratch_shapes=[
            pltpu.VMEM((n, width, 2 * T), jnp.float32),
            pltpu.VMEM((n, width, T), jnp.float32),
            pltpu.VMEM((n, width, T), jnp.float32),
            pltpu.VMEM((n, T), jnp.float32),
            pltpu.VMEM((width, T), jnp.float32),
            pltpu.VMEM((width, T), jnp.float32),
            pltpu.VMEM((3, c.kp, 2 * T), jnp.float32),
            pltpu.VMEM((c.kp, 2 * T), jnp.float32),
            pltpu.VMEM((c.kp, 2 * T), jnp.float32),
        ],
        interpret=True,
    )(xb.real.astype(np.float32), xb.imag.astype(np.float32), *coefs, *gc)
    inv = np.argsort(perm)
    k_f = (np.asarray(dr) + 1j * np.asarray(di))[inv].T
    np.testing.assert_allclose(k_f, k_o, rtol=2e-3, atol=2e-4)


@pytest.fixture(scope="module")
def fused_result(problem, hc, workload):
    x0, tgt_b, diff_b, _ = workload
    fast = fused.make_track_fn(problem, hc, tile=_TILE, interpret=True)
    return fast(x0, tgt_b, diff_b)


@pytest.mark.slow
def test_fused_tracker_matches_oracle(hc, oracle_result, fused_result):
    rf = fused_result
    ro = oracle_result
    assert (rf.num_steps == ro.num_steps).all()
    assert (rf.converged == ro.converged).all()
    assert (rf.pruned == ro.pruned).all()
    assert (rf.inf_fail == ro.inf_fail).all()
    rel = np.abs(rf.x - ro.x).max() / max(np.abs(ro.x).max(), 1.0)
    assert rel < 1e-3


@pytest.mark.slow
@pytest.mark.parametrize("structure", ["gathered", "merged"])
def test_structure_tracker_matches_classic(problem, hc, workload,
                                           fused_result, structure):
    """Full fused tracker with each eval_structure variant vs classic.

    The variants are algebraically identical but compiler-rounding-equal
    only (~1 ulp per eval; test_eval_core_variants / the kernel
    docstrings), and HC paths amplify seed differences, so outcomes must
    agree exactly on flags/step counts for this short 12-step workload
    while final states agree to a loose tolerance (measured divergence
    ~1e-3 relative after 13 steps).  This pins the variant kernel-side
    wiring (constant plumbing in fused._make_kernel /
    build_kernel_caller), so a TPU campaign can't be wasted on a
    plumbing bug.
    """
    x0, tgt_b, diff_b, _ = workload
    hc_v = dataclasses.replace(hc, eval_structure=structure)
    fast = fused.make_track_fn(problem, hc_v, tile=_TILE, interpret=True)
    rm = fast(x0, tgt_b, diff_b)
    rf = fused_result
    assert (rm.num_steps == rf.num_steps).all()
    assert (rm.converged == rf.converged).all()
    assert (rm.pruned == rf.pruned).all()
    assert (rm.inf_fail == rf.inf_fail).all()
    rel = np.abs(rm.x - rf.x).max() / max(np.abs(rf.x).max(), 1.0)
    assert rel < 2e-2


@pytest.mark.slow
@pytest.mark.parametrize("pred", ["rk3", "rk2"])
def test_predictor_tracker_matches_oracle(problem, hc, workload, pred):
    """Lower-order predictors (HCConfig.predictor): fused kernel vs the
    XLA oracle must agree flag-for-flag, pinning the kernel-side stage
    wiring before a TPU campaign spends time on it (adoption itself is
    gated on convergence statistics, like every step-semantics change).
    """
    x0, tgt_b, diff_b, _ = workload
    hc_p = dataclasses.replace(hc, predictor=pred)
    ro = tracker.make_track_fn(problem, hc_p)(x0, tgt_b, diff_b)
    rf = fused.make_track_fn(problem, hc_p, tile=_TILE, interpret=True)(
        x0, tgt_b, diff_b
    )
    assert (rf.num_steps == ro.num_steps).all()
    assert (rf.converged == ro.converged).all()
    assert (rf.pruned == ro.pruned).all()
    assert (rf.inf_fail == ro.inf_fail).all()
    live = ~ro.pruned & ~ro.inf_fail
    assert live.any()
    rel = np.abs(rf.x[live] - ro.x[live]).max() / max(
        np.abs(ro.x[live]).max(), 1.0)
    assert rel < 1e-3


@pytest.mark.slow
def test_cjr_tracker_matches_oracle(problem, hc, workload):
    """Modified-Newton corrector (CJR, HCConfig): fused kernel vs oracle.

    The fused kernel replays the saved factorization of the first
    corrector iterate's Hx on later iterations' H rhs
    (fused._reduce_resolve_rhs); the XLA oracle freezes the Hx MATRIX
    and re-solves (ops/tracker.py corr_body) -- the same modified-Newton
    map through different algorithms, so flags/step counts must agree
    exactly on the short test workload, like the full-Newton parity
    test above.  This pins the CJR kernel wiring before any TPU
    campaign spends time on it.
    """
    x0, tgt_b, diff_b, _ = workload
    # predictor_handoff off: CJR + CPH stack two replay-vs-resolve
    # rounding channels per step, pushing the value band past 1e-3;
    # this test isolates the CJR wiring (CPH has its own parity test).
    hc_c = dataclasses.replace(hc, corrector_jacobian_reuse=1,
                               predictor_handoff=False)
    ro = tracker.make_track_fn(problem, hc_c)(x0, tgt_b, diff_b)
    rf = fused.make_track_fn(problem, hc_c, tile=_TILE, interpret=True)(
        x0, tgt_b, diff_b
    )
    assert (rf.num_steps == ro.num_steps).all()
    assert (rf.converged == ro.converged).all()
    assert (rf.pruned == ro.pruned).all()
    assert (rf.inf_fail == ro.inf_fail).all()
    # Value band on LIVE paths only (measured 4e-6): inf-failed/pruned
    # paths hold diverged states where replay-vs-resolve rounding
    # (~1e-5/solve) amplifies without bound under CJR's linear (not
    # quadratic) contraction.
    live = ~ro.pruned & ~ro.inf_fail
    assert live.any()
    rel = np.abs(rf.x[live] - ro.x[live]).max() / max(
        np.abs(ro.x[live]).max(), 1.0)
    assert rel < 1e-3


@pytest.mark.slow
def test_segmented_matches_oracle(cfg, problem, hc, workload, oracle_result):
    from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import segmented

    x0, tgt_b, diff_b, _ = workload
    seg = segmented.make_segmented_track_fn(
        problem, hc, cfg.ransac, tile=_TILE, interpret=True
    )
    rs = seg(x0, tgt_b, diff_b)
    ro = oracle_result
    assert (rs.track.num_steps == ro.num_steps).all()
    assert (rs.track.converged == ro.converged).all()
    assert (rs.track.pruned == ro.pruned).all()
    assert rs.found_path == -1  # abort disabled in the default config


def test_eval_core_variants(problem):
    """Eval-structure variants vs classic (plain f32 dots).

    Both variants are algebraically identical to classic but XLA does
    not guarantee bit-reproducibility across restructured graphs (it
    re-fuses elementwise producers and contracts FMAs per consumer), so
    both get a ~1-ulp relative tolerance (see the kernel docstrings);
    in this standalone eager context they happen to land much closer.
    """
    import jax.numpy as jnp

    c = fused.FusedConstants.build(problem)
    T = 8
    rng = np.random.default_rng(7)
    xp = rng.standard_normal((31, 2 * T)).astype(np.float32)
    xp[30, :T] = 1.0
    xp[30, T:] = 0.0
    # Realistic magnitude spread (the parameter products span ~1e-2..1e3);
    # uniform-unit random data can mask summation-order rounding.
    P = (rng.standard_normal((c.kp, 2 * T))
         * 10.0 ** rng.uniform(-2, 3, (c.kp, 1))).astype(np.float32)
    consts = tuple(
        jnp.asarray(a)
        for a in (c.ohx23, c.ohx2g, c.ohx3g, c.chx, c.cht, c.chtneg)
    )
    consts_g = tuple(
        jnp.asarray(a) for a in (c.ohx23, c.ohg, c.chx, c.cht, c.chtneg)
    )
    consts_m = tuple(
        jnp.asarray(a) for a in (c.ohx23, c.ohg, c.fold_h, c.fold_t)
    )
    for want_h in (True, False):
        hx, rhs = fused._eval_core(
            c, consts, jnp.asarray(P), jnp.asarray(xp), T, want_h
        )
        scale_h = np.abs(np.asarray(hx)).max()
        scale_r = np.abs(np.asarray(rhs)).max()
        hxg, rhsg = fused._eval_core_gathered(
            c, consts_g, jnp.asarray(P), jnp.asarray(xp), T, want_h
        )
        np.testing.assert_allclose(
            np.asarray(hxg), np.asarray(hx), atol=1e-5 * scale_h, rtol=0)
        np.testing.assert_allclose(
            np.asarray(rhsg), np.asarray(rhs), atol=1e-5 * scale_r, rtol=0)
        hxm, rhsm = fused._eval_core_merged(
            c, consts_m, jnp.asarray(P), jnp.asarray(xp), T, want_h
        )
        np.testing.assert_allclose(
            np.asarray(hxm[: c.nnz]), np.asarray(hx),
            atol=1e-5 * scale_h, rtol=0)
        np.testing.assert_allclose(
            np.asarray(rhsm), np.asarray(rhs), atol=1e-5 * scale_r, rtol=0)
        # Fold output rows between nnz..nzp and beyond n are structural
        # zeros (padding rows of the block-diagonal fold).
        assert bool((hxm[c.nnz: c.nzp] == 0.0).all())


def test_kdot_matches_sdot_split(problem):
    """split3k (shipped default): the K-concatenated split dot vs the
    per-matmul 3-term split, through the full eval core.

    _kdot moves the h+l1+l2 add association into the MXU K-accumulation;
    both forms are exact 3-term bf16 splits of the same f32 data, so
    they agree to final rounding (~1 ulp per output), never bit-exactly.
    Pins the campaign-13 adoption's CPU-checkable half (the TPU halves
    are the reconcile conv/real/inf gates recorded in the config
    docstring)."""
    import jax.numpy as jnp

    c = fused.FusedConstants.build(problem)
    T = 8
    rng = np.random.default_rng(11)
    xp = rng.standard_normal((31, 2 * T)).astype(np.float32)
    xp[30, :T] = 1.0
    xp[30, T:] = 0.0
    P = (rng.standard_normal((c.kp, 2 * T))
         * 10.0 ** rng.uniform(-2, 3, (c.kp, 1))).astype(np.float32)
    consts_b = tuple(
        jnp.asarray(a).astype(jnp.bfloat16)
        for a in (c.ohx23, c.ohx2g, c.ohx3g, c.chx, c.cht, c.chtneg)
    )
    consts_k = tuple(jnp.concatenate([cb] * 3, axis=1) for cb in consts_b)
    for want_h in (True, False):
        hx, rhs = fused._eval_core(
            c, consts_b, jnp.asarray(P), jnp.asarray(xp), T, want_h,
            dot=fused._sdot)
        hxk, rhsk = fused._eval_core(
            c, consts_k, jnp.asarray(P), jnp.asarray(xp), T, want_h,
            dot=fused._kdot)
        scale_h = np.abs(np.asarray(hx)).max()
        scale_r = np.abs(np.asarray(rhs)).max()
        np.testing.assert_allclose(
            np.asarray(hxk), np.asarray(hx), atol=1e-5 * scale_h, rtol=0)
        np.testing.assert_allclose(
            np.asarray(rhsk), np.asarray(rhs), atol=1e-5 * scale_r, rtol=0)


@pytest.mark.slow
def test_cph_tracker_matches_oracle(problem, hc, workload):
    """Corrector->predictor factorization handoff (CPH, HCConfig
    predictor_handoff): fused kernel vs oracle.

    On every step whose predecessor advanced all lanes, stage 1 replays
    the corrector's saved factorization on the fresh -Ht rhs (kernel) /
    solves against the saved Hx matrix (oracle) -- the same modified
    predictor through different algorithms.  The handoff condition is
    batch == tile here, so flags/step counts must agree exactly, like
    the CJR parity test.  Pins the kernel wiring (branch scheduling,
    save/replay slot reuse, cont[1] lifecycle) before TPU time is spent.
    """
    x0, tgt_b, diff_b, _ = workload
    hc_h = dataclasses.replace(hc, predictor_handoff=True)
    ro = tracker.make_track_fn(problem, hc_h)(x0, tgt_b, diff_b)
    rf = fused.make_track_fn(problem, hc_h, tile=_TILE, interpret=True)(
        x0, tgt_b, diff_b
    )
    assert (rf.num_steps == ro.num_steps).all()
    assert (rf.converged == ro.converged).all()
    assert (rf.pruned == ro.pruned).all()
    assert (rf.inf_fail == ro.inf_fail).all()
    live = ~ro.pruned & ~ro.inf_fail
    assert live.any()
    rel = np.abs(rf.x[live] - ro.x[live]).max() / max(
        np.abs(ro.x[live]).max(), 1.0)
    assert rel < 1e-3
