"""Condensed elimination: group reduction + compacted reduced system.

The static schedule (ops/schedule.py) eliminates 30 columns in 30
sequential pivot stages; profiling shows each stage costs a near-constant
~0.6 us of VPU issue overhead regardless of window size, so the stage
COUNT (not the flop volume) is the single-chip elimination floor
(README per-phase table).  This module condenses the chain by symbolic
analysis of the sparsity pattern:

* **Group families** -- disjoint sets of <=3 rows that own "local"
  columns (columns whose entire structural support lies inside the
  group).  Every group in a family is eliminated in ONE batched stage
  (the group axis is just a leading tensor dimension), and the group's
  surviving rows are *compacted*: dead pivot rows never travel into
  later windows.  For the trifocal 30x30 pattern this finds 6 depth
  triples (3 rows / 1 local), 4 quads (3 rows / 2 locals) and -- on the
  condensed pattern -- 2 pairs (2 rows / 1 local), consuming 16 of the
  30 pivots in 3 batched stages instead of 16 sequential ones.
* **Reduced system** -- the surviving 14 combined rows over the 14
  remaining columns, solved by the ordinary static schedule.  Windows
  shrink from 30x32 to 14x16 because used rows are gone.

Numerics are IDENTICAL to the full schedule: each group elimination is
exactly the schedule's restricted partial pivoting (same |Re|+|Im|
metric, same first-hit tie break in ascending row order, same
zero-pivot -> 1 guard, reference dev-cgesv-batched-small.cuh:50-95), and
compaction removes only rows the schedule would never read again.  Pivot
choices and per-row update arithmetic match the full schedule
stage-for-stage; only summation order in back-substitution dot products
differs (ulp-level).  ``solve_numpy`` is the host oracle for the fused
kernel's reduced path.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import (
    schedule as sched,
)


@dataclasses.dataclass(frozen=True)
class GroupSpec:
    """One elimination group inside a family.

    rows: input row refs -- indices into the level's input row list.
    local_cols: columns eliminated by this group, in elimination order
    (ascending structural support, mirroring the greedy schedule).
    """

    rows: Tuple[int, ...]
    local_cols: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class Family:
    """A batch of same-shape groups eliminated in one stage.

    level: 0 = groups of original matrix rows; k>0 = groups over the
    concatenated output rows of level k-1 (see ``level_inputs``).
    g: rows per group; l: local columns per group (= pivots consumed).
    """

    level: int
    g: int
    l: int
    groups: Tuple[GroupSpec, ...]


@dataclasses.dataclass(frozen=True)
class ReductionPlan:
    n: int
    families: Tuple[Family, ...]
    # Per level: the input row provenance. level_rows[0] = originals
    # (0..n-1); level_rows[k] = refs produced by ``level_outputs``.
    num_levels: int
    # Final condensed system: row provenance (level, index-into-level
    # input list) is implicit via final_rows; cols keep original ids.
    final_rows: Tuple[Tuple[int, int], ...]   # (level, row_ref)
    final_cols: Tuple[int, ...]               # original col ids, in
    # elimination order of the final schedule
    schedule: sched.SolveSchedule             # over compressed col ids
    # Structural column sets of every level's input rows (level 0 =
    # original pattern rows); consumers use these to size col windows.
    level_patterns: Tuple[Tuple[frozenset, ...], ...] = ()

    @property
    def num_group_pivots(self) -> int:
        return sum(f.l * len(f.groups) for f in self.families)


def _level_output_refs(
    n_in: int, groups: Sequence[GroupSpec]
) -> Tuple[List[Tuple[str, int, int]], List[int]]:
    """Output row refs of one level: group survivors then passthrough.

    Survivor slots are ("out", group_idx, slot) with g-l slots per
    group; passthrough rows keep their input index.  Output order is
    [all group outputs in group order] + [passthrough in input order] --
    the fixed convention every consumer (solver + kernel) relies on.
    """
    grouped = set()
    outs: List[Tuple[str, int, int]] = []
    for gi, gr in enumerate(groups):
        grouped.update(gr.rows)
        for s in range(len(gr.rows) - len(gr.local_cols)):
            outs.append(("out", gi, s))
    passthrough = [r for r in range(n_in) if r not in grouped]
    return outs, passthrough


def _find_level_groups(
    patterns: List[frozenset], max_rows: int = 3, max_locals: int = 2
) -> List[GroupSpec]:
    """Find disjoint row groups owning local columns, schedule-greedily.

    Columns are considered in the greedy schedule's preference order
    (support size, then union-pattern size, then column id) so the
    groups found are exactly the candidate sets the full schedule's
    early steps would use -- keeping pivot choices identical.
    """
    n_rows = len(patterns)
    support: dict = {}
    for r, p in enumerate(patterns):
        for c in p:
            support.setdefault(c, set()).add(r)

    def union_size(rows):
        u: set = set()
        for r in rows:
            u |= patterns[r]
        return len(u)

    order = sorted(
        support, key=lambda c: (len(support[c]), union_size(support[c]), c)
    )
    parent = list(range(n_rows))

    def find(r):
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    comp_size = [1] * n_rows
    for c in order:
        roots = {find(r) for r in support[c]}
        if sum(comp_size[r] for r in roots) > max_rows:
            continue
        it = iter(roots)
        base = next(it)
        for r in it:
            parent[r] = base
            comp_size[base] += comp_size[r]

    comps: dict = {}
    for r in range(n_rows):
        comps.setdefault(find(r), []).append(r)
    groups: List[GroupSpec] = []
    for rows in comps.values():
        if len(rows) < 2:
            continue
        rset = set(rows)
        locs = [c for c in support if support[c] <= rset]
        if not 1 <= len(locs) <= min(max_locals, len(rows) - 1):
            continue
        locs.sort(key=lambda c: (len(support[c]), union_size(support[c]), c))
        groups.append(GroupSpec(tuple(sorted(rows)), tuple(locs)))
    groups.sort(key=lambda g: g.rows)
    return groups


def build_reduction(pattern: np.ndarray) -> Optional[ReductionPlan]:
    """Symbolic condensation of a fixed sparsity pattern.

    Returns None when no group family exists (the plain schedule is then
    the right tool).  The final condensed pattern must be square
    (rows == remaining cols); the trifocal pattern condenses 30 -> 14.
    """
    n = pattern.shape[0]
    rhs = n
    patterns = [
        frozenset(np.nonzero(pattern[r])[0].tolist()) for r in range(n)
    ]
    families: List[Family] = []
    level_row_refs: List[List[Tuple[int, int]]] = [
        [(0, r) for r in range(n)]
    ]
    level_patterns: List[Tuple[frozenset, ...]] = [tuple(patterns)]
    level = 0
    while True:
        groups = _find_level_groups(patterns)
        if not groups:
            break
        # Split into same-shape families (batched together in a kernel).
        by_shape: dict = {}
        for gr in groups:
            by_shape.setdefault((len(gr.rows), len(gr.local_cols)), []).append(
                gr
            )
        for (g, l), grs in sorted(by_shape.items()):
            families.append(Family(level, g, l, tuple(grs)))
        # Next level's rows: group outputs then passthrough.
        outs, passthrough = _level_output_refs(len(patterns), groups)
        new_patterns: List[frozenset] = []
        new_refs: List[Tuple[int, int]] = []
        next_idx = 0
        for kind, gi, _slot in outs:
            gr = groups[gi]
            u: set = set()
            for r in gr.rows:
                u |= patterns[r]
            new_patterns.append(frozenset(u - set(gr.local_cols)))
            new_refs.append((level + 1, next_idx))
            next_idx += 1
        for r in passthrough:
            new_patterns.append(patterns[r])
            new_refs.append(level_row_refs[level][r])
        patterns = new_patterns
        level_patterns.append(tuple(patterns))
        level_row_refs.append(
            [(level + 1, i) for i in range(len(new_patterns))]
        )
        level += 1
    if level == 0:
        return None
    remaining = sorted({c for p in patterns for c in p})
    if len(remaining) != len(patterns):
        return None  # condensed system not square; bail out
    col_of = {c: i for i, c in enumerate(remaining)}
    m = len(remaining)
    fp = np.zeros((m, m), bool)
    for r, p in enumerate(patterns):
        for c in p:
            fp[r, col_of[c]] = True
    s = sched.build_schedule(fp)
    final_cols = tuple(remaining[st.col] for st in s.steps)
    # final_rows provenance: (level, index) of each condensed-system row
    # in its level's row list; since the loop above rebuilt refs per
    # level, the last level's refs are just (level, i).
    final_rows = tuple((level, i) for i in range(len(patterns)))
    return ReductionPlan(
        n=n,
        families=tuple(families),
        num_levels=level,
        final_rows=final_rows,
        final_cols=final_cols,
        schedule=s,
        level_patterns=tuple(level_patterns),
    )


# ---------------------------------------------------------------------------
# Host oracle.
# ---------------------------------------------------------------------------


def _group_eliminate(
    rows: np.ndarray, local_cols: Sequence[int]
) -> Tuple[np.ndarray, List[Tuple[int, np.ndarray]]]:
    """Eliminate local_cols from a (g, w) group with restricted partial
    pivoting; return compacted survivors (ascending original order) and
    the saved (col, pivot_row) list.  Semantics identical to
    sched.solve_numpy restricted to the group."""
    g = rows.shape[0]
    used = np.zeros(g, bool)
    saved: List[Tuple[int, np.ndarray]] = []
    for c in local_cols:
        metric = np.abs(rows[:, c].real) + np.abs(rows[:, c].imag)
        metric[used] = -1.0
        p = int(np.argmax(metric))  # first hit on ties, like the kernel
        prow = rows[p].copy()
        piv = prow[c]
        if piv == 0:
            piv = 1.0
        saved.append((c, prow))
        for r in range(g):
            if r == p:
                continue
            f = rows[r, c] / piv
            rows[r] = rows[r] - f * prow
        used[p] = True
    return rows[~used], saved


def solve_numpy(
    plan: ReductionPlan, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Host executor of a ReductionPlan on one dense system (test oracle).

    a: (n, n) complex, b: (n,) -> x (n,).  Mirrors the fused kernel's
    reduced path: batched family eliminations with compaction, the
    static schedule on the condensed system, then family recoveries in
    reverse order (each a saved-pivot-row back-substitution step).
    """
    n = plan.n
    dt = np.complex64 if a.dtype == np.complex64 else complex
    w = n + 1
    rows0 = np.zeros((n, w), dtype=dt)
    rows0[:, :n] = a
    rows0[:, n] = b
    level_rows: List[np.ndarray] = [rows0]
    saved_fams: List[List[Tuple[int, np.ndarray]]] = []
    # Forward: walk levels; within a level, groups across all families.
    for level in range(plan.num_levels):
        fams = [f for f in plan.families if f.level == level]
        groups = sorted(
            (gr for f in fams for gr in f.groups), key=lambda g: g.rows
        )
        cur = level_rows[level]
        outs: List[np.ndarray] = []
        saves: List[Tuple[int, np.ndarray]] = []
        grouped: set = set()
        for gr in groups:
            grouped.update(gr.rows)
            sub = cur[list(gr.rows)].copy()
            surv, sv = _group_eliminate(sub, gr.local_cols)
            outs.append(surv)
            saves.extend(sv)
        passthrough = [r for r in range(cur.shape[0]) if r not in grouped]
        nxt = np.concatenate(outs + [cur[passthrough]], axis=0) \
            if outs else cur[passthrough]
        level_rows.append(nxt)
        saved_fams.append(saves)
    # Condensed system -> schedule solve.
    final = level_rows[-1]
    m = plan.schedule.n
    remaining = sorted(set(plan.final_cols))
    fa = final[:, remaining]
    fb = final[:, n]
    xf = sched.solve_numpy(plan.schedule, fa, fb)
    x = np.zeros(w, dtype=dt)
    x[n] = -1.0
    for i, c in enumerate(remaining):
        x[c] = xf[i]
    # Recoveries: reverse level order, reverse save order within level.
    for saves in reversed(saved_fams):
        for c, prow in reversed(saves):
            piv = prow[c]
            if piv == 0:
                piv = 1.0
            acc = prow @ x - prow[c] * x[c]
            x[c] = -acc / piv
    return x[:n]
