"""Host-side evaluation: solution statistics, uniqueness, pose residuals, and
the reference-format output writers.

Equivalent of the reference Evaluations class (magmaHC/Evaluations.cpp) and
the stats blocks of the CLI driver (cmd/magmaHC-main.cpp:71-116). Latent bugs
of the reference are implemented by *intent*, not replicated: the
converged/inf/real column swap at collection time (GPU_HC_Solver.cpp:522-524),
the double-offset converged-flag indexing in
Transform_GPUHC_Sols_to_Trifocal_Relative_Pose (Evaluations.cpp:317), and the
never-cleared max-support index vector whose element [0] is always the first
candidate (Evaluations.cpp:457-504).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import numpy as np

from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import RansacConfig


@dataclasses.dataclass
class SolutionStats:
    """Per-round solution statistics (Evaluations.cpp:145-182).

    The Percentage_Of_* fields (Evaluations.hpp:78-81) are exposed as
    properties; num_unique is filled by the caller when a dedup pass ran
    (-1 = not computed).  The reference declares Percentage_Of_Unique_Sols
    but never assigns it (always 0.0); here it is unique/num_paths.
    """

    num_converged: int
    num_infinity: int
    num_real: int
    num_paths: int
    num_unique: int = -1

    @property
    def pct_converged(self) -> float:
        """Percentage_Of_Convergence (Evaluations.cpp:179)."""
        return self.num_converged / max(self.num_paths, 1)

    @property
    def pct_infinity(self) -> float:
        """Percentage_Of_Inf_Sols (Evaluations.cpp:180)."""
        return self.num_infinity / max(self.num_paths, 1)

    @property
    def pct_real(self) -> float:
        """Percentage_Of_Real_Sols (Evaluations.cpp:181)."""
        return self.num_real / max(self.num_paths, 1)

    @property
    def pct_unique(self) -> float:
        """Percentage_Of_Unique_Sols (Evaluations.hpp:81; see class doc)."""
        return max(self.num_unique, 0) / max(self.num_paths, 1)


def collect_stats(
    x: np.ndarray,
    converged: np.ndarray,
    inf_fail: np.ndarray,
    ransac: RansacConfig,
) -> SolutionStats:
    """Count converged / infinity / real solutions over the whole batch.

    A solution is 'real' when converged and every variable's imaginary part
    is within ZERO_IMAG_PART_TOL_FOR_SP (Evaluations.cpp:152-166).
    """
    real = converged & (np.abs(x.imag) <= ransac.zero_imag_part_tol).all(axis=-1)
    return SolutionStats(
        num_converged=int(converged.sum()),
        num_infinity=int(inf_fail.sum()),
        num_real=int(real.sum()),
        num_paths=int(x.shape[0]),
    )


def find_unique_solutions(
    x: np.ndarray, converged: np.ndarray, tol: float = 1e-4
) -> np.ndarray:
    """Indices of unique converged solutions (Evaluations.cpp:184-233).

    Two solutions are duplicates when every variable agrees within tol in
    both real and imaginary parts.
    """
    idx = np.nonzero(converged)[0]
    if idx.size == 0:
        return idx
    xs = x[idx]
    keep = []
    taken = np.zeros(len(idx), dtype=bool)
    for i in range(len(idx)):
        if taken[i]:
            continue
        keep.append(idx[i])
        d = np.abs(xs.real - xs.real[i]) < tol
        d &= np.abs(xs.imag - xs.imag[i]) < tol
        taken |= d.all(axis=-1)
    return np.asarray(keep)


def find_unique_solutions_reference(
    x: np.ndarray, converged: np.ndarray, num_tracks: int, tol: float = 1e-4
) -> np.ndarray:
    """Exact reference Find_Unique_Sols semantics (Evaluations.cpp:184-233).

    Differences from find_unique_solutions, preserved as quirks so
    ``--dedup-mode reference`` reproduces the reference's exact count:
    only RANSAC iteration 0 is scanned (the loop runs bs < num_of_tracks);
    the duplicate scan compares against ALL later tracks regardless of
    their convergence; and the skip set is REPLACED by the latest
    duplicate set rather than accumulated (:231), so a duplicate of an
    earlier solution can itself be counted unique later.
    """
    n = min(num_tracks, x.shape[0])
    keep = []
    skip: set = set()
    for bs in range(n):
        if not converged[bs]:
            continue
        if skip and bs in skip:
            continue
        d = np.abs(x[bs + 1:n].real - x[bs].real) < tol
        d &= np.abs(x[bs + 1:n].imag - x[bs].imag) < tol
        dup = np.nonzero(d.all(axis=-1))[0] + bs + 1
        if dup.size == 0:
            keep.append(bs)
        else:
            skip = set(int(i) for i in dup)
    return np.asarray(keep, dtype=np.int64)


def min_residuals_over_sols(
    r21s: np.ndarray,
    r31s: np.ndarray,
    t21s: np.ndarray,
    t31s: np.ndarray,
    gt_pose21: np.ndarray,
    gt_pose31: np.ndarray,
    ransac: RansacConfig,
) -> Tuple["PoseErrors", bool]:
    """Min residual over all candidate poses + any-within-tol success flag.

    Measure_Relative_Pose_Error_from_All_Real_Sols (Evaluations.cpp:545-583):
    each residual is minimised independently over the candidate set, and
    success_flag is true when ANY single pose has all four residuals within
    tolerance.  Empty candidate set keeps the 100.0 init (:41-44).
    """
    gr21, gt21u = decompose_gt_pose(gt_pose21)
    gr31, gt31u = decompose_gt_pose(gt_pose31)
    if len(r21s) == 0:
        return PoseErrors(100.0, 100.0, 100.0, 100.0), False
    rr21 = rotation_residual(gr21, r21s)
    rr31 = rotation_residual(gr31, r31s)
    tt21 = translation_residual(gt21u, t21s)
    tt31 = translation_residual(gt31u, t31s)
    success = bool(np.any(
        (rr21 < ransac.rot_residual_tol)
        & (rr31 < ransac.rot_residual_tol)
        & (tt21 < ransac.transl_residual_tol)
        & (tt31 < ransac.transl_residual_tol)
    ))
    return (
        PoseErrors(
            rot21=float(rr21.min()), rot31=float(rr31.min()),
            transl21=float(tt21.min()), transl31=float(tt31.min()),
        ),
        success,
    )


def rotation_residual(r_gt: np.ndarray, r: np.ndarray) -> np.ndarray:
    """acos((trace(R_gt^T R) - 1) / 2), broadcast over leading dims
    (Evaluations.cpp:360-374)."""
    tr = np.einsum("ij,...ij->...", r_gt, r)
    return np.arccos(np.clip(0.5 * (tr - 1.0), -1.0, 1.0))


def translation_residual(t_gt_unit: np.ndarray, t: np.ndarray) -> np.ndarray:
    """|<t_gt, t/|t|> - 1| (Evaluations.cpp:376-380); both unit-normalised."""
    tn = t / np.linalg.norm(t, axis=-1, keepdims=True)
    return np.abs(tn @ t_gt_unit - 1.0)


def decompose_gt_pose(pose: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(3, 4) [R | t] -> (R, unit t) (Evaluations.hpp:114-115 + normalise)."""
    r = pose[:, :3]
    t = pose[:, 3]
    return r, t / np.linalg.norm(t)


@dataclasses.dataclass
class PoseErrors:
    rot21: float
    rot31: float
    transl21: float
    transl31: float

    def within(self, ransac: RansacConfig) -> bool:
        return (
            self.rot21 < ransac.rot_residual_tol
            and self.rot31 < ransac.rot_residual_tol
            and self.transl21 < ransac.transl_residual_tol
            and self.transl31 < ransac.transl_residual_tol
        )


def measure_pose_error(
    r21: np.ndarray,
    r31: np.ndarray,
    t21: np.ndarray,
    t31: np.ndarray,
    gt_pose21: np.ndarray,
    gt_pose31: np.ndarray,
) -> PoseErrors:
    """Residuals of one estimated trifocal pose vs GT (Evaluations.cpp:526-549)."""
    gr21, gt21 = decompose_gt_pose(gt_pose21)
    gr31, gt31 = decompose_gt_pose(gt_pose31)
    return PoseErrors(
        rot21=float(rotation_residual(gr21, r21)),
        rot31=float(rotation_residual(gr31, r31)),
        transl21=float(translation_residual(gt21, t21)),
        transl31=float(translation_residual(gt31, t31)),
    )


def format_gt_deviation(
    r21: np.ndarray,
    r31: np.ndarray,
    t21: np.ndarray,
    t31: np.ndarray,
    gt_pose21: np.ndarray,
    gt_pose31: np.ndarray,
) -> str:
    """GT-deviation debug report for one (veridical) solution.

    Equivalent of Check_Deviations_of_Veridical_Sol_from_GT
    (Evaluations.cpp:267-296, driven under DEBUG_EARLY_RANSAC_ABORT,
    GPU_HC_Solver.cpp:462-480): prints the normalised GT and solution
    translations side by side plus all four rotation/translation residuals,
    so a device-selected abort pose can be eyeballed against ground truth.
    """
    _, gt21 = decompose_gt_pose(gt_pose21)
    _, gt31 = decompose_gt_pose(gt_pose31)
    n21 = t21 / np.linalg.norm(t21)
    n31 = t31 / np.linalg.norm(t31)
    pe = measure_pose_error(r21, r31, t21, t31, gt_pose21, gt_pose31)

    def v(x):
        return f"({x[0]:.6g}, {x[1]:.6g}, {x[2]:.6g})"

    return (
        f"GT translation_21 = {v(gt21)}\n"
        f"GT translation_31 = {v(gt31)}\n"
        f"Sol translation_21 = {v(n21)}\n"
        f"Sol translation_31 = {v(n31)}\n"
        f"Residuals in Rotations:    (R21) {pe.rot21:.6g} "
        f"(R31) {pe.rot31:.6g}\n"
        f"Residuals in Translations: (t21) {pe.transl21:.6g} "
        f"(t31) {pe.transl31:.6g}"
    )


# ---------------------------------------------------------------------------
# Output writers (reference D6 formats).
# ---------------------------------------------------------------------------


def write_timings(path: str, timings_ms: Sequence[float]) -> None:
    """GPU_Timings.txt format: one wall-clock ms per round per line
    (cmd/magmaHC-main.cpp:98-105)."""
    with open(path, "w") as f:
        for t in timings_ms:
            f.write(f"{t}\n")


def write_sols_statistics(path: str, stats: Sequence[SolutionStats]) -> None:
    """*_Sols_Statistics.txt: 'converged  infinity  real' per round.

    Intent order (the reference swaps columns 2-3 at collection time,
    GPU_HC_Solver.cpp:522-524 -- not replicated).
    """
    with open(path, "w") as f:
        for s in stats:
            f.write(f"{s.num_converged}\t{s.num_infinity}\t{s.num_real}\n")


def write_converged_sols(
    path: str,
    x: np.ndarray,
    converged: np.ndarray,
    num_tracks: int,
) -> None:
    """*_Converged_HC_tracks.txt format (Evaluations.cpp:120-143)."""
    num_vars = x.shape[1]
    n_ransac = x.shape[0] // num_tracks
    counter = 0
    with open(path, "w") as f:
        for ri in range(n_ransac):
            f.write(f"-------------------- RANSAC Iteration {ri + 1} --------------------\n\n")
            for bs in range(num_tracks):
                i = ri * num_tracks + bs
                if converged[i]:
                    f.write(f"{counter}\n")
                    for v in range(num_vars):
                        f.write(f"{x[i, v].real:.20g}\t{x[i, v].imag:.20g}\n")
                    f.write("\n")
                counter += 1
            f.write("\n")


def write_hc_steps(path: str, steps: Sequence[int]) -> None:
    """*HC_Steps_of_Actual_Solutions.txt: HC step counts of the solutions that
    matched GT (Evaluations.cpp:506-521)."""
    with open(path, "w") as f:
        for s in steps:
            f.write(f"{int(s)}\n")


def timing_summary(timings_ms: Sequence[float]) -> dict:
    """avg/max/min/sigma like the reference driver (cmd/magmaHC-main.cpp:77-95)."""
    a = np.asarray(timings_ms, dtype=np.float64)
    return {
        "avg_ms": float(a.mean()),
        "max_ms": float(a.max()),
        "min_ms": float(a.min()),
        "std_ms": float(a.std()),
    }
