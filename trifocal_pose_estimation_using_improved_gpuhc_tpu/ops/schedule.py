"""Static elimination schedules for batched sparse complex solves.

The trifocal Jacobian Hx has a FIXED sparsity pattern (170 of 900 entries,
models/trifocal.py) shared by every path and every HC step.  The reference
solves it as a dense 30x30 pivoted LU per CUDA warp
(dev-cgesv-batched-small.cuh:38-107); on TPU the batch is the vector (lane)
dimension, so every pivot search / row update is a full-lane VPU op -- and a
dense elimination wastes ~5x flops on structural zeros.

This module performs the *symbolic* analysis once at problem-load time and
emits a static schedule: an ordered list of elimination steps, each naming

  * ``col``  -- the variable (column) eliminated at this step,
  * ``rows`` -- the candidate pivot rows: every row that can structurally
    hold a nonzero in ``col`` at this point (original pattern plus
    worst-case fill from all earlier steps),
  * ``cols`` -- the union of the candidate rows' structural column patterns
    (the only columns the elimination update can touch).

Numerically (ops/fused.py) each step picks, per path, the not-yet-used
candidate row with the largest |Re|+|Im| pivot metric (the reference's
metric, dev-cgesv-batched-small.cuh:55), so this is exact partial pivoting
of the column-permuted matrix: rows outside ``rows`` hold exact zeros in
``col`` and could never win the pivot search anyway.  The chosen pivot row
(after all earlier updates) is saved per step; back-substitution walks the
schedule in reverse using the saved rows only.

Fill tracking is conservative: after a step, every candidate row's pattern
becomes the union ``cols`` minus the eliminated column, because any of them
may have been the pivot for some path in the batch.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class ElimStep:
    col: int                 # column (variable) eliminated
    rows: Tuple[int, ...]    # candidate pivot rows (static superset)
    cols: Tuple[int, ...]    # columns the update may touch (incl. rhs)


@dataclasses.dataclass(frozen=True)
class SolveSchedule:
    n: int                    # system size (30)
    width: int                # row storage width (n + 1 rhs, padded)
    rhs_col: int              # column index of the rhs inside a row
    steps: Tuple[ElimStep, ...]

    @property
    def update_volume(self) -> int:
        """Total candidate-row x touched-col volume (flop proxy)."""
        return sum(len(s.rows) * len(s.cols) for s in self.steps)


def build_schedule(pattern: np.ndarray, width: int | None = None) -> SolveSchedule:
    """Greedy static elimination schedule for a fixed sparsity pattern.

    pattern: (n, n) bool -- structural nonzeros of the matrix.
    Column order is chosen greedily to minimise per-step
    (num_candidate_rows, union_pattern_size): eliminating the most
    decoupled variables first delays the fill cascade into the dense
    (Cayley-rotation) tail.
    """
    n = pattern.shape[0]
    if width is None:
        width = n + 2  # n cols + rhs + pad to even
    rhs = n  # rhs column index
    pats: List[set] = [set(np.nonzero(pattern[r])[0]) | {rhs} for r in range(n)]

    remaining = set(range(n))
    steps: List[ElimStep] = []
    while remaining:
        best = None
        for j in sorted(remaining):
            C = [r for r in range(n) if j in pats[r]]
            if not C:
                raise ValueError(f"structurally singular: no row holds col {j}")
            U = set()
            for r in C:
                U |= pats[r]
            cost = (len(C), len(U), j)
            if best is None or cost < best[0]:
                best = (cost, j, C, U)
        _, j, C, U = best
        steps.append(
            ElimStep(col=j, rows=tuple(sorted(C)), cols=tuple(sorted(U)))
        )
        # Worst-case fill: any candidate may have been the pivot, so every
        # candidate row's pattern becomes the union minus the dead column.
        new_pat = (U - {j})
        for r in C:
            pats[r] = set(new_pat)
        remaining.remove(j)
    return SolveSchedule(n=n, width=width, rhs_col=rhs, steps=tuple(steps))


def dense_schedule(n: int, width: int | None = None) -> SolveSchedule:
    """Degenerate schedule: classic dense partial-pivoted elimination."""
    if width is None:
        width = n + 2
    cols = tuple(range(n)) + (n,)
    rows = tuple(range(n))
    return SolveSchedule(
        n=n,
        width=width,
        rhs_col=n,
        steps=tuple(ElimStep(col=j, rows=rows, cols=cols) for j in range(n)),
    )


def find_interval_row_order(schedule: SolveSchedule) -> np.ndarray:
    """Row permutation making candidate sets contiguous where possible.

    The batched kernel reads/writes each step's candidate rows as one slice;
    a row order under which every ``steps[i].rows`` set is an interval turns
    per-row gathers into single vector ops.  For the trifocal pattern the
    candidate sets are unions of disjoint row groups and a perfect interval
    order exists; the greedy ordered-partition refinement below finds it.
    Any set the refinement cannot make contiguous simply splits into several
    runs at kernel-build time, so this is best-effort by construction.

    Returns row_order (n,): new position -> original row.
    """
    n = schedule.n
    # Ordered partition refinement (PQ-tree lite): process candidate sets
    # from smallest to largest; for each, group member blocks together.
    blocks: List[List[int]] = [list(range(n))]
    for st in sorted(schedule.steps, key=lambda s: len(s.rows)):
        c = set(st.rows)
        new_blocks: List[List[int]] = []
        members: List[List[int]] = []
        insert_at = None
        for b in blocks:
            inside = [r for r in b if r in c]
            outside = [r for r in b if r not in c]
            if inside:
                if insert_at is None:
                    insert_at = len(new_blocks)
                members.append(inside)
            if outside:
                new_blocks.append(outside)
        if insert_at is not None:
            for m in reversed(members):
                new_blocks.insert(insert_at, m)
        blocks = new_blocks
    order = [r for b in blocks for r in b]
    return np.array(order, np.int32)


def row_runs(rows: Sequence[int], pos_of_row: np.ndarray) -> Tuple[Tuple[int, int], ...]:
    """Split a candidate set into maximal contiguous runs of new positions."""
    ps = sorted(int(pos_of_row[r]) for r in rows)
    runs = []
    start = prev = ps[0]
    for p in ps[1:]:
        if p == prev + 1:
            prev = p
            continue
        runs.append((start, prev + 1))
        start = prev = p
    runs.append((start, prev + 1))
    return tuple(runs)


def solve_numpy(
    schedule: SolveSchedule, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Reference (host) executor of a schedule on one system. Test oracle.

    a: (n, n) complex, b: (n,) complex -> x (n,).
    Mirrors exactly the batched kernel semantics: |Re|+|Im| pivot metric,
    used-row masking, zero-pivot -> 1 guard, saved-row back-substitution.
    """
    n = schedule.n
    w = schedule.width
    m = np.zeros((n, w), dtype=np.complex64 if a.dtype == np.complex64 else complex)
    m[:, :n] = a
    m[:, schedule.rhs_col] = b
    used = np.zeros(n, dtype=bool)
    saved: List[Tuple[int, np.ndarray]] = []
    for st in schedule.steps:
        rows = np.array(st.rows)
        metric = np.abs(m[rows, st.col].real) + np.abs(m[rows, st.col].imag)
        metric[used[rows]] = -1.0
        p = rows[int(np.argmax(metric))]
        prow = m[p].copy()
        piv = prow[st.col]
        if piv == 0:
            piv = 1.0
        saved.append((st.col, prow))
        for r in rows:
            if r == p:
                continue
            f = m[r, st.col] / piv
            m[r] = m[r] - f * prow
        used[p] = True
    x = np.zeros(w, dtype=m.dtype)
    x[schedule.rhs_col] = -1.0
    for col, prow in reversed(saved):
        piv = prow[col]
        if piv == 0:
            piv = 1.0
        acc = prow @ x
        x[col] = -(acc - prow[col] * x[col]) / piv
    return x[:n]
