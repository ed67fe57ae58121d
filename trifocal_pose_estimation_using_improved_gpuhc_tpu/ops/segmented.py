"""Segmented path tracking: survivor compaction + RANSAC early abort.

The reference exploits divergent path lifetimes implicitly: CUDA blocks
whose path converged/pruned retire and free their SM, and with TrunRANSAC
every block polls a global found-flag and skips its whole loop once any
block finds a >=90%-support pose (kernel_GPUHC_..._TrunRANSAC.cu:152,
dev-trifocal_2op1p-eval.cuh:235-246).  A TPU core is one big SIMD machine,
so the equivalent is restructured:

* Tracking runs in SEGMENTS of ``segment_steps`` HC steps (one fused-kernel
  launch over all path tiles, ops/fused.py).
* Between segments, surviving (active) paths are COMPACTED to the front of
  the batch with a stable sort, so dead tiles hold no active lane and skip
  their whole next segment -- the SIMD analogue of block retirement.
* With abort enabled, paths that converged during the segment are scored
  on-device: pose-component-imaginary gate (IMAG_PART_TOL), Cayley ->
  rotation, reprojection-inlier counts over every edgel for both view
  pairs, pass iff both ratios >= 0.90 (dev-trifocal_2op1p-eval.cuh:46-246
  semantics, vectorised as one (candidates x edgels) broadcast).  A hit
  stops the whole batch at the next segment boundary.

* Under ``axis_name`` (hypothesis-sharded multi-chip execution through
  parallel/mesh.py), the found-flag is all-reduced (max) across chips at
  every segment boundary, so one chip's hit stops EVERY chip -- *stronger*
  than the reference, whose abort flag never crosses GPUs
  (...TrunRANSAC.cu:152 polls a per-GPU global; SURVEY.md section 2.4) --
  and the best-support pose is selected with an all_gather + argmax
  instead of the reference's host stacking loop (Evaluations.cpp:382-504).
  The segment loop runs while ANY chip has active paths, keeping the trip
  count uniform so the in-loop collective is legal.

Everything (segment kernel, scoring, compaction, the while loop) lives in
one jitted program; nothing returns to the host until tracking finishes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from trifocal_pose_estimation_using_improved_gpuhc_tpu.models.trifocal import (
    TrifocalProblem,
)
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import fused
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import ransac
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops.tracker import (
    TrackResult,
)
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
    HCConfig,
    RansacConfig,
)

# Converged candidates scored per segment.  Paths that converge in a
# segment where the slots overflow stay marked un-scored and are picked up
# at the next segment boundary, so no candidate is ever silently skipped.
_SCORE_SLOTS = 128


class SegmentedResult(NamedTuple):
    """TrackResult fields + TrunRANSAC outputs."""

    track: TrackResult
    found: bool            # a >=90%-support pose was found on-device
    found_path: int        # global path index of the first found pose (-1)
    best_support: int      # best min(n21, n31) among scored candidates (-1)
    best_path: int         # global path index of that candidate (-1)


def make_segmented_track_fn(
    problem: TrifocalProblem,
    cfg: HCConfig,
    ransac_cfg: Optional[RansacConfig] = None,
    tile: int = 256,
    interpret: bool = False,
    axis_name: Optional[str] = None,
):
    """Build the segmented tracking function.

    Returned ``track(x0, tgt, diff, edgels=None, intrinsics=None)`` ->
    SegmentedResult.  ``track.jitted`` takes f32 planes plus (edgels
    (E, 6), intrinsics (3, 3), num_edgels ()) and returns the plane tuple
    + (found, found_path, best_support, best_path); edgel scoring runs only
    when ``ransac_cfg`` has abort_by_good_sol set.

    axis_name: when the function runs per-shard under shard_map
    (parallel/mesh.py), the name of the hypothesis mesh axis -- enables the
    cross-chip abort all-reduce and global best-pose selection.
    """
    c = fused.FusedConstants.build(
        problem,
        solver="schedule" if cfg.rk_jacobian_reuse else cfg.solver,
    )
    seg = max(1, cfg.segment_steps)
    n_segments = -(-(cfg.max_steps + 1) // seg)
    run = fused.build_kernel_caller(c, problem, cfg, tile, seg, interpret)
    perm = np.asarray(c.perm)
    inv = np.argsort(perm)
    pos_of_var = np.asarray(c.pos_of_var)
    pose_rows = pos_of_var[18:30]  # T21, T31, Cayley21, Cayley31 positions
    abort = bool(ransac_cfg and ransac_cfg.abort_by_good_sol)
    imag_tol = ransac_cfg.imag_part_tol if ransac_cfg else 1e-5
    thresh_px = ransac_cfg.reproj_inlier_thresh_px if ransac_cfg else 2.0
    ratio = ransac_cfg.pass_inlier_support_ratio if ransac_cfg else 0.9

    def _active(fl):
        t = fl[fused._F_T]
        conv = (t >= 1.0) | (1.0 - t <= cfg.t_converged_eps)
        return (
            (~conv)
            & (fl[fused._F_INF] < 0.5)
            & (fl[fused._F_PRN] < 0.5)
        )

    def _converged(fl):
        t = fl[fused._F_T]
        return (t >= 1.0) | (1.0 - t <= cfg.t_converged_eps)

    def _score_new(x_re, x_im, fl, scored, order, best_supp, best_path,
                   edgels, kmat, n_edgels):
        """Score newly-converged paths.

        Returns (found, found_path, scored, best_supp, best_path).
        Vectorised dev-trifocal_2op1p-eval.cuh:46-246: imag gate on the 12
        pose components, Cayley -> R (column-normalised), inlier counts
        over all edgels for view pairs 1-2 and 1-3, pass iff both ratios
        >= 0.90.  Only paths actually placed into the scoring slots are
        marked scored, so slot overflow defers (never drops) candidates.
        """
        newly = _converged(fl) & (scored < 0.5)
        # Stable-sort newly-converged paths into the scoring slots.
        sidx = jnp.argsort(~newly, stable=True)[:_SCORE_SLOTS]
        valid = newly[sidx]
        scored = scored.at[sidx].max(valid.astype(jnp.float32))
        pr = x_re[pose_rows][:, sidx]   # (12, S) real parts
        pi = x_im[pose_rows][:, sidx]
        gate = jnp.max(jnp.abs(pi), axis=0) < imag_tol
        t21 = pr[0:3].T                 # (S, 3)
        t31 = pr[3:6].T
        from trifocal_pose_estimation_using_improved_gpuhc_tpu.models import (
            trifocal as tfm,
        )

        r21 = tfm.cayley_to_rotation(pr[6:9].T)
        r31 = tfm.cayley_to_rotation(pr[9:12].T)
        n21, n31 = ransac.count_inlier_support(
            r21, r31, t21, t31, edgels, kmat, thresh_px=thresh_px
        )
        need = ratio * n_edgels
        hit = (
            valid & gate
            & (n21.astype(jnp.float32) >= need)
            & (n31.astype(jnp.float32) >= need)
        )
        found = jnp.any(hit)
        first = jnp.argmax(hit)
        found_path = jnp.where(found, order[sidx[first]], -1)
        # Running best-support candidate (on-device maximal-support
        # selection; host scoring stays the authoritative full gate).
        smin = jnp.where(valid & gate, jnp.minimum(n21, n31), -1)
        sbest = jnp.argmax(smin)
        better = smin[sbest] > best_supp
        best_supp = jnp.where(better, smin[sbest], best_supp)
        best_path = jnp.where(better, order[sidx[sbest]], best_path)
        return found, found_path, scored, best_supp, best_path

    def _compact(arrays, active, t):
        """Pack active paths to the front, ordered by tracking progress.

        Dead paths go last (their tiles skip whole segments); among the
        living, higher-t paths group together so whole tiles hit their
        in-kernel early exit mid-segment instead of idling as masked lanes.
        """
        key = jnp.where(active, 1.0 - t, 2.0)
        order_idx = jnp.argsort(key, stable=True)
        return [jnp.take(a, order_idx, axis=1) for a in arrays], order_idx

    def _track_planes(x0_re, x0_im, tgt_re, tgt_im, diff_re, diff_im,
                      edgels, kmat, n_edgels):
        B = x0_re.shape[0]
        Bp = -(-B // tile) * tile

        def padb(a):
            if Bp != B:
                a = jnp.concatenate(
                    [a, jnp.broadcast_to(a[:1], (Bp - B,) + a.shape[1:])],
                    axis=0,
                )
            return a.T

        coefs = list(fused.build_pair_coefs(
            problem, diff_re, diff_im, Bp, tgt_re, tgt_im,
            basis=cfg.pair_coef_basis, dynamic_start=False,
        ))
        x_re = padb(x0_re)[perm]
        x_im = padb(x0_im)[perm]
        fl = fused.init_flags(cfg, Bp)
        # Padded lanes replicate path 0; mark them pruned so they never
        # count as active (their results are sliced away anyway).
        if Bp != B:
            lane = jnp.arange(Bp)
            fl = fl.at[fused._F_PRN].set((lane >= B).astype(jnp.float32))
        order = jnp.arange(Bp, dtype=jnp.int32)
        scored = jnp.zeros((Bp,), jnp.float32)
        found = jnp.array(False)
        found_path = jnp.array(-1, jnp.int32)
        best_supp = jnp.array(-1, jnp.int32)
        best_path = jnp.array(-1, jnp.int32)

        def cond(carry):
            (si, x_re, x_im, xl_re, xl_im, fl, coefs, order, scored,
             found, found_path, best_supp, best_path) = carry
            keep = jnp.any(_active(fl)) & (si < n_segments)
            if axis_name is None:
                if abort:
                    keep = keep & (~found)
                return keep
            # Cross-chip TrunRANSAC: one all-reduce(max) per segment
            # boundary carries [any-chip-still-active, any-chip-found];
            # the loop keeps a uniform trip count across the mesh and one
            # chip's hit stops every chip (stronger than the reference's
            # per-GPU flag, ...TrunRANSAC.cu:152).
            packed = jnp.stack(
                [keep.astype(jnp.int32),
                 (found if abort else jnp.array(False)).astype(jnp.int32)]
            )
            packed = jax.lax.pmax(packed, axis_name)
            keep_g = packed[0] > 0
            if abort:
                keep_g = keep_g & (packed[1] == 0)
            return keep_g

        def body(carry):
            (si, x_re, x_im, xl_re, xl_im, fl, coefs, order, scored,
             found, found_path, best_supp, best_path) = carry
            remaining = jnp.minimum(
                jnp.int32(cfg.max_steps + 1) - si.astype(jnp.int32) * seg,
                seg,
            )
            x_re, x_im, xl_re, xl_im, fl = run(
                (x_re, x_im, xl_re, xl_im, fl), tuple(coefs),
                niter=remaining[None],
            )
            if abort:
                f2, fp2, scored, best_supp, best_path = _score_new(
                    x_re, x_im, fl, scored, order, best_supp, best_path,
                    edgels, kmat, n_edgels
                )
                found_path = jnp.where(found, found_path, fp2)
                found = found | f2
            if cfg.compact_survivors:
                # Unconditionally: skipping the pack when few paths died
                # was measured slower -- masked dead lanes accumulate faster
                # than the ~11 ms the batched lane gathers cost.
                arrays = [x_re, x_im, xl_re, xl_im, fl] + coefs + [
                    order[None, :], scored[None, :]
                ]
                arrays, _ = _compact(arrays, _active(fl), fl[fused._F_T])
                (x_re, x_im, xl_re, xl_im, fl) = arrays[:5]
                coefs = arrays[5:11]
                order = arrays[11][0]
                scored = arrays[12][0]
            return (si + 1, x_re, x_im, xl_re, xl_im, fl, coefs, order,
                    scored, found, found_path, best_supp, best_path)

        carry = (jnp.array(0), x_re, x_im, x_re, x_im, fl, coefs, order,
                 scored, found, found_path, best_supp, best_path)
        carry = jax.lax.while_loop(cond, body, carry)
        (_, x_re, x_im, _, _, fl, _, order, _,
         found, found_path, best_supp, best_path) = carry

        # Undo compaction, drop padding, restore variable order.
        unperm = jnp.argsort(order)
        x_re = jnp.take(x_re, unperm, axis=1)
        x_im = jnp.take(x_im, unperm, axis=1)
        fl = jnp.take(fl, unperm, axis=1)
        xr = x_re[inv][:, :B].T
        xi = x_im[inv][:, :B].T

        if axis_name is not None:
            # Global result selection (replaces the reference's host-side
            # result stacking + scan, GPU_HC_Solver.cpp:494-506 +
            # Evaluations.cpp:382-504): local path ids become global via
            # the shard offset, then an all_gather + argmax picks the
            # first finder and the maximal-support candidate.
            ai = jax.lax.axis_index(axis_name)
            off = ai.astype(jnp.int32) * jnp.int32(B)
            gfp = jnp.where(found_path >= 0, found_path + off, -1)
            gbp = jnp.where(best_path >= 0, best_path + off, -1)
            founds = jax.lax.all_gather(found, axis_name)
            fps = jax.lax.all_gather(gfp, axis_name)
            supps = jax.lax.all_gather(best_supp, axis_name)
            bps = jax.lax.all_gather(gbp, axis_name)
            fdev = jnp.argmax(founds)
            found = jnp.any(founds)
            found_path = jnp.where(found, fps[fdev], -1)
            bdev = jnp.argmax(supps)
            best_supp = supps[bdev]
            best_path = bps[bdev]

        return (xr, xi) + fused.flags_outputs(cfg, fl, B) + (
            found, found_path, best_supp, best_path
        )

    if axis_name is None:
        _track_planes = jax.jit(_track_planes)

    def track(x0, target_params, diff_params, edgels=None,
              intrinsics=None, n_edgels=None) -> SegmentedResult:
        x0 = np.asarray(x0)
        tgt = np.asarray(target_params)
        diff = np.asarray(diff_params)
        f32 = np.float32
        if edgels is None:
            edgels = np.full((8, 6), 1e3, f32)
            intrinsics = np.eye(3, dtype=f32)
            n_edgels = 8
        out = _track_planes(
            x0.real.astype(f32), x0.imag.astype(f32),
            tgt.real.astype(f32), tgt.imag.astype(f32),
            diff.real.astype(f32), diff.imag.astype(f32),
            np.asarray(edgels, f32), np.asarray(intrinsics, f32),
            np.float32(n_edgels if n_edgels is not None else len(edgels)),
        )
        (xr, xi, conv, inf, pruned, steps,
         found, found_path, best_supp, best_path) = out
        x = np.asarray(xr) + 1j * np.asarray(xi)
        return SegmentedResult(
            track=TrackResult(
                x=x.astype(np.complex64),
                converged=np.asarray(conv),
                inf_fail=np.asarray(inf),
                pruned=np.asarray(pruned),
                num_steps=np.asarray(steps),
            ),
            found=bool(np.asarray(found)),
            found_path=int(np.asarray(found_path)),
            best_support=int(np.asarray(best_supp)),
            best_path=int(np.asarray(best_path)),
        )

    track.jitted = _track_planes
    track.constants = c
    return track
