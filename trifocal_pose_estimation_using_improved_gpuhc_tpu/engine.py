"""End-to-end trifocal pose estimation engine: RANSAC over HC path tracking.

Orchestrator equivalent of the reference GPU_HC_Solver lifecycle
(GPU_HC_Solver.hpp:103-113: Allocate / Read_Problem_Data / Read_RANSAC_Data /
Prepare_Target_Params / Data_Transfer / Solve) plus the evaluation tail of
cmd/magmaHC-main.cpp:24-116 -- re-designed around jitted JAX programs instead
of explicit allocation/transfer phases: arrays are built host-side as f32
planes, one compiled program tracks all tracks x hypotheses paths, and a
second scores candidate poses against all edgels.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from trifocal_pose_estimation_using_improved_gpuhc_tpu.models import trifocal
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import ransac, tracker
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils import data_io
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils import evaluation as evl
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
    EngineConfig,
    ransac_data_dir,
)

# Fixed padding caps so jit programs are compiled once across rounds/views.
_CANDIDATE_CAP = 512
_EDGEL_PAD = 1024


def _pad_to(a: np.ndarray, n: int, fill: float = 0.0) -> np.ndarray:
    if a.shape[0] >= n:
        return a[:n]
    pad = np.full((n - a.shape[0],) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


@dataclasses.dataclass
class RoundResult:
    """One RANSAC round on one view triplet."""

    stats: evl.SolutionStats
    track_ms: float          # path-tracking wall clock (the reference's timed span)
    total_ms: float          # tracking + candidate scoring + selection
    num_candidates: int
    best_support21: int
    best_support31: int
    num_edgels: int
    found_pose: bool          # >= 0.9 support on both pairs (TrunRANSAC criterion)
    pose_errors: Optional[evl.PoseErrors]
    best_pose: Optional[tuple]  # (R21, R31, t21, t31) numpy
    num_steps: np.ndarray     # per-path HC step counts
    # HC step counts of the maximal-support solutions: the union of the
    # candidates tying max support on pair 1-2 and on pair 1-3
    # (Evaluations.cpp:506-521 semantics, via get_Solution_with_Maximal_Support).
    actual_sol_steps: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int32)
    )
    # Fundamental matrices of the candidate poses (Evaluations.cpp:298-358
    # collects F21/F31 per converged candidate): (n_cand, 3, 3) each.
    cand_f21: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3, 3), np.float32)
    )
    cand_f31: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3, 3), np.float32)
    )


class TrifocalPoseEngine:
    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.problem = trifocal.TrifocalProblem.load(cfg)
        self._segmented = False
        backend = cfg.hc.backend
        interp = jax.default_backend() == "cpu"
        if backend == "fused" and interp and not os.environ.get(
            "TPUHC_FORCE_INTERPRET"
        ):
            # On the CPU backend the XLA tracker IS the product (the CPU-HC
            # solver, reference CPU_HC_Solver.cpp); interpreted Pallas is
            # only for kernel-parity tests (TPUHC_FORCE_INTERPRET=1).
            backend = "xla"
        self._ndev = cfg.num_devices or 1
        if self._ndev > 1:
            # Hypothesis data parallelism over a device mesh: the exact
            # integration point of the reference's multi-GPU sharding
            # (GPU_HC_Solver.cpp:84-88); see parallel/mesh.py.
            from trifocal_pose_estimation_using_improved_gpuhc_tpu.parallel import (
                mesh as pmesh,
            )

            if self._ndev > len(jax.devices()):
                raise ValueError(
                    f"num_devices={self._ndev} > visible devices "
                    f"{len(jax.devices())}"
                )
            m = pmesh.make_mesh(self._ndev)
            if backend == "fused":
                mb = (
                    "segmented"
                    if cfg.hc.compact_survivors
                    or cfg.ransac.abort_by_good_sol
                    else "fused"
                )
                self.track = pmesh.make_sharded_track_fn(
                    self.problem, cfg.hc, m, backend=mb,
                    interpret=interp, ransac_cfg=cfg.ransac,
                    tile=cfg.hc.tile,
                )
                self._segmented = mb == "segmented"
            else:
                self.track = pmesh.make_sharded_track_fn(
                    self.problem, cfg.hc, m, backend="xla"
                )
        elif backend == "p2c":
            # The P2C ablation variant on the production fused kernel
            # (ops/p2c.py; the reference's archived baseline strategy).
            from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import (
                p2c,
            )
            from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
                problem_dir,
            )

            tables = p2c.derive_coeff_map(self.problem, problem_dir(cfg))
            self.track = p2c.make_fused_p2c_track_fn(
                self.problem, tables, cfg.hc, tile=cfg.hc.tile,
                interpret=interp,
            )
        elif backend == "fused":
            if cfg.hc.compact_survivors or cfg.ransac.abort_by_good_sol:
                from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import (
                    segmented,
                )

                self.track = segmented.make_segmented_track_fn(
                    self.problem, cfg.hc, cfg.ransac,
                    tile=cfg.hc.tile, interpret=interp,
                )
                self._segmented = True
            else:
                from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import (
                    fused,
                )

                self.track = fused.make_track_fn(
                    self.problem, cfg.hc, tile=cfg.hc.tile, interpret=interp
                )
        else:
            self.track = tracker.make_track_fn(self.problem, cfg.hc)
        self._pose_fn = jax.jit(
            lambda xr: trifocal.solution_to_pose(xr.astype(jnp.float32))
        )
        self._score_fn = jax.jit(
            lambda r21, r31, t21, t31, edgels, k: ransac.count_inlier_support(
                r21, r31, t21, t31, edgels, k,
                thresh_px=cfg.ransac.reproj_inlier_thresh_px,
            )
        )
        self._intrinsics = data_io.load_intrinsic_matrix(ransac_data_dir(cfg))

    # -- data ---------------------------------------------------------------
    def load_view(self, view_index: int) -> data_io.RansacView:
        return data_io.load_ransac_view(ransac_data_dir(self.cfg), view_index)

    # -- one RANSAC round ---------------------------------------------------
    def run_round(
        self,
        view: data_io.RansacView,
        seed: int,
        num_hypotheses: Optional[int] = None,
        collect_solutions: bool = False,
    ) -> RoundResult:
        cfg = self.cfg
        H = num_hypotheses or cfg.ransac.num_iterations
        # Hypotheses pad up to the device count so every mesh shard owns
        # whole hypotheses (the reference's static per-GPU split,
        # GPU_HC_Solver.cpp:84-88); extras are real samples, sliced away
        # after tracking.
        Hp = -(-H // self._ndev) * self._ndev
        T = self.problem.num_tracks
        n_edgels = view.edge_locations.shape[0]

        samples = ransac.sample_edgel_triplets(seed, n_edgels, Hp)
        tgt = ransac.build_target_params(
            view.edge_locations, view.edge_tangents, samples
        )
        tgt_b = np.repeat(tgt, T, axis=0)
        diff_b = tgt_b - self.problem.start_params
        x0 = np.tile(np.asarray(self.problem.start_sols), (Hp, 1))

        # Host sampling + H2D staging are outside the timed span, matching
        # the reference: Prepare_Target_Params and the data transfer are
        # separate phases and magma_wtime only brackets kernel launch+sync
        # (GPU_HC_Solver.cpp:335-362, :384-446).
        f32 = np.float32
        host_args = [
            x0.real.astype(f32), x0.imag.astype(f32),
            tgt_b.real.astype(f32), tgt_b.imag.astype(f32),
            diff_b.real.astype(f32), diff_b.imag.astype(f32),
        ]
        edgels_padded = _pad_to(
            view.edge_locations.astype(f32),
            _EDGEL_PAD * -(-n_edgels // _EDGEL_PAD),
            1e3,
        )
        if self._segmented:
            host_args += [
                edgels_padded, self._intrinsics.astype(f32),
                np.float32(n_edgels),
            ]

        abort = self._segmented and cfg.ransac.abort_by_good_sol
        if abort:
            # TrunRANSAC chunking: hypotheses launch in chunks; once one
            # chunk reports a >=90%-support pose, the rest are skipped
            # entirely (the explicit form of the reference's serialised
            # late blocks seeing the abort flag, ...TrunRANSAC.cu:152).
            chunk_h = min(cfg.ransac.abort_chunk, Hp)
            chunk_h = -(-chunk_h // self._ndev) * self._ndev
            n_chunks = -(-Hp // chunk_h)
            per = chunk_h * T
            chunks = []
            for ci in range(n_chunks):
                lo, hi = ci * per, min((ci + 1) * per, Hp * T)
                args = [a[lo:hi] for a in host_args[:6]] + host_args[6:]
                if hi - lo < per:  # ragged tail: pad with first paths
                    args[:6] = [
                        np.concatenate([a, a[: per - (hi - lo)]])
                        for a in args[:6]
                    ]
                chunks.append([jax.device_put(a) for a in args])
            # Force staging completion with a tiny d2h read per chunk:
            # block_until_ready returns without blocking on some TPU
            # runtimes (same fence as the non-abort path below), so the
            # timed span provably excludes H2D staging.
            for ch in chunks:
                np.asarray(ch[0][:1, :1])

            t_start = time.perf_counter()
            # Speculative pipeline: dispatch chunk i+1 before reading chunk
            # i's found flag, so the flag's d2h round trip overlaps the next
            # chunk's compute (dispatch is async; a hit wastes at most one
            # chunk of speculative work -- the reference wastes the same in
            # blocks already resident when its flag flips).
            t_track = None
            outs, done_chunks = [], 0
            pending = self.track.jitted(*chunks[0])
            for ci in range(n_chunks):
                outs.append(pending)
                done_chunks += 1
                if ci + 1 < n_chunks:
                    nxt = self.track.jitted(*chunks[ci + 1])
                else:
                    nxt = None
                if bool(np.asarray(pending[6])):
                    break
                pending = nxt
            t_track = time.perf_counter()

            def cat(i, fill):
                done = np.concatenate(
                    [np.asarray(o[i]) for o in outs], axis=0
                )[: done_chunks * per]
                if done.shape[0] < H * T:
                    pad_shape = (H * T - done.shape[0],) + done.shape[1:]
                    done = np.concatenate(
                        [done, np.full(pad_shape, fill, done.dtype)]
                    )
                return done[: H * T]  # ragged/device padding sliced away

            res = tracker.TrackResult(
                x=(cat(0, 0.0) + 1j * cat(1, 0.0)).astype(np.complex64),
                converged=cat(2, False),
                inf_fail=cat(3, False),
                pruned=cat(4, False),
                num_steps=cat(5, 0),
            )
        else:
            dev = [jax.device_put(a) for a in host_args]
            jax.block_until_ready(dev)

            t_start = time.perf_counter()
            out = self.track.jitted(*dev)
            # Force completion with a small d2h read: on some TPU runtimes
            # block_until_ready returns before the computation has drained.
            np.asarray(out[2])
            t_track = time.perf_counter()

            if self._segmented:
                xr, xi, conv, inf, pruned, steps = out[:6]
            else:
                xr, xi, conv, inf, pruned, steps = out
            res = tracker.TrackResult(
                x=(np.asarray(xr) + 1j * np.asarray(xi)).astype(
                    np.complex64
                )[: H * T],
                converged=np.asarray(conv)[: H * T],
                inf_fail=np.asarray(inf)[: H * T],
                pruned=np.asarray(pruned)[: H * T],
                num_steps=np.asarray(steps)[: H * T],
            )

        (stats, n_cand, best21, best31, found, best_pose,
         pose_errors, actual_steps, f21s, f31s) = self._score_round(view, res)
        t_end = time.perf_counter()

        rr = RoundResult(
            stats=stats,
            track_ms=(t_track - t_start) * 1e3,
            total_ms=(t_end - t_start) * 1e3,
            num_candidates=n_cand,
            best_support21=best21,
            best_support31=best31,
            num_edgels=n_edgels,
            found_pose=found,
            pose_errors=pose_errors,
            best_pose=best_pose,
            num_steps=res.num_steps,
            actual_sol_steps=actual_steps,
            cand_f21=f21s,
            cand_f31=f31s,
        )
        if collect_solutions:
            rr.solutions = res  # type: ignore[attr-defined]
        return rr

    def _score_round(self, view: data_io.RansacView, res: tracker.TrackResult):
        """Candidate gating + inlier scoring + best-pose selection.

        Candidate gate (Evaluations.cpp:330-343): converged, rotation
        components real within IMAG_PART_TOL, all depths non-negative;
        then maximal joint support selection (Evaluations.cpp:382-504).
        """
        cfg = self.cfg
        n_edgels = view.edge_locations.shape[0]
        stats = evl.collect_stats(
            res.x, res.converged, res.inf_fail, cfg.ransac
        )
        cand = (
            res.converged
            & (np.abs(res.x[:, 24:30].imag)
               < cfg.ransac.imag_part_tol).all(axis=1)
            & (res.x[:, 0:8].real >= 0).all(axis=1)
        )
        cand_idx = np.nonzero(cand)[0]
        n_cand = int(cand_idx.size)
        best21 = best31 = 0
        found = False
        pose_errors = None
        best_pose = None
        actual_steps = np.zeros(0, np.int32)
        f21s = f31s = np.zeros((0, 3, 3), np.float32)
        if n_cand:
            xs = _pad_to(
                res.x[cand_idx].real.astype(np.float32), _CANDIDATE_CAP
            )
            r21, r31, t21, t31 = map(np.asarray, self._pose_fn(xs))
            edgels = _pad_to(
                view.edge_locations,
                _EDGEL_PAD * -(-n_edgels // _EDGEL_PAD), 1e3,
            )
            n21, n31 = self._score_fn(
                r21, r31, t21, t31, edgels, self._intrinsics
            )
            n21 = np.asarray(n21)[: min(n_cand, _CANDIDATE_CAP)]
            n31 = np.asarray(n31)[: min(n_cand, _CANDIDATE_CAP)]
            bi = int(np.argmax(np.minimum(n21, n31)))
            best21, best31 = int(n21[bi]), int(n31[bi])
            ratio = cfg.ransac.pass_inlier_support_ratio
            found = (best21 >= ratio * n_edgels
                     and best31 >= ratio * n_edgels)
            best_pose = (r21[bi], r31[bi], t21[bi], t31[bi])
            pose_errors = evl.measure_pose_error(
                r21[bi], r31[bi], t21[bi], t31[bi],
                view.gt_pose21, view.gt_pose31,
            )
            # "Actual solutions": candidates tying the maximal support on
            # either view pair (Evaluations.cpp:457-504 index vectors,
            # union at :512-515); their HC step counts feed the
            # *HC_Steps_of_Actual_Solutions.txt writer.
            mx = cand_idx[: min(n_cand, _CANDIDATE_CAP)]
            actual = np.union1d(
                mx[n21 == n21.max()], mx[n31 == n31.max()]
            )
            actual_steps = res.num_steps[actual].astype(np.int32)
            nc = min(n_cand, _CANDIDATE_CAP)
            # Host numpy: 3x3 work on <=512 candidates (eager device ops
            # here would cost seconds of tunnel round trips per round).
            kinv = np.linalg.inv(self._intrinsics)

            def _fmats(r, t):
                sk = np.zeros((len(t), 3, 3), np.float32)
                sk[:, 0, 1], sk[:, 0, 2] = -t[:, 2], t[:, 1]
                sk[:, 1, 0], sk[:, 1, 2] = t[:, 2], -t[:, 0]
                sk[:, 2, 0], sk[:, 2, 1] = -t[:, 1], t[:, 0]
                return kinv.T @ (sk @ r) @ kinv

            f21s = _fmats(r21[:nc], t21[:nc])
            f31s = _fmats(r31[:nc], t31[:nc])
        return (stats, n_cand, best21, best31, found, best_pose,
                pose_errors, actual_steps, f21s, f31s)

    def _prep_host_args(self, view, seed: int, H: int):
        T = self.problem.num_tracks
        H = -(-H // self._ndev) * self._ndev  # whole hypotheses per shard
        n_edgels = view.edge_locations.shape[0]
        samples = ransac.sample_edgel_triplets(seed, n_edgels, H)
        tgt = ransac.build_target_params(
            view.edge_locations, view.edge_tangents, samples
        )
        tgt_b = np.repeat(tgt, T, axis=0)
        diff_b = tgt_b - self.problem.start_params
        x0 = np.tile(np.asarray(self.problem.start_sols), (H, 1))
        f32 = np.float32
        host_args = [
            x0.real.astype(f32), x0.imag.astype(f32),
            tgt_b.real.astype(f32), tgt_b.imag.astype(f32),
            diff_b.real.astype(f32), diff_b.imag.astype(f32),
        ]
        if self._segmented:
            host_args += [
                _pad_to(view.edge_locations.astype(f32),
                        _EDGEL_PAD * -(-n_edgels // _EDGEL_PAD), 1e3),
                self._intrinsics.astype(f32),
                np.float32(n_edgels),
            ]
        return host_args

    def _out_to_result(self, out) -> tracker.TrackResult:
        xr, xi, conv, inf, pruned, steps = out[:6]
        return tracker.TrackResult(
            x=(np.asarray(xr) + 1j * np.asarray(xi)).astype(np.complex64),
            converged=np.asarray(conv),
            inf_fail=np.asarray(inf),
            pruned=np.asarray(pruned),
            num_steps=np.asarray(steps),
        )

    def run_stream(self, view_indices, num_hypotheses: Optional[int] = None,
                   seed: int = 0):
        """Streamed tracking-loss recovery over a sequence of views.

        The production serving loop: while the device tracks view i, the
        host loads + samples + stages view i+1 and dispatches it behind the
        current work, then scores view i -- host prep and d2h of one view
        overlap device tracking of the next. Returns (results, views/s).
        (The reference processes views strictly serially,
        cmd/magmaHC-main.cpp:24-75.)
        """
        cfg = self.cfg
        H = num_hypotheses or cfg.ransac.num_iterations
        views = [self.load_view(vi) for vi in view_indices[:1]]

        def dispatch(view, s):
            dev = [jax.device_put(a)
                   for a in self._prep_host_args(view, s, H)]
            return self.track.jitted(*dev), time.perf_counter()

        t0 = time.perf_counter()
        results = []
        pending, t_disp = dispatch(views[0], seed)
        for i, vi in enumerate(view_indices):
            view = views[i]
            if i + 1 < len(view_indices):
                views.append(self.load_view(view_indices[i + 1]))
                nxt = dispatch(views[i + 1], seed)
            else:
                nxt = None
            res = self._out_to_result(pending)  # d2h sync for view i
            t_done = time.perf_counter()
            # Pipeline latency of this view: dispatch -> results on host
            # (overlaps the next view's tracking by design).
            view_ms = (t_done - t_disp) * 1e3
            (stats, n_cand, b21, b31, found, pose, perr,
             actual_steps, f21s, f31s) = self._score_round(view, res)
            results.append(RoundResult(
                stats=stats, track_ms=view_ms,
                total_ms=(time.perf_counter() - t_disp) * 1e3,
                num_candidates=n_cand, best_support21=b21,
                best_support31=b31,
                num_edgels=view.edge_locations.shape[0],
                found_pose=found, pose_errors=perr, best_pose=pose,
                num_steps=res.num_steps,
                actual_sol_steps=actual_steps,
            ))
            if nxt is not None:
                pending, t_disp = nxt
        total_s = time.perf_counter() - t0
        return results, len(view_indices) / total_s

    def warmup(self, num_hypotheses: Optional[int] = None) -> None:
        """Compile the tracking/scoring programs on a tiny synthetic round."""
        view = self.load_view(0)
        self.run_round(view, seed=0, num_hypotheses=num_hypotheses)
