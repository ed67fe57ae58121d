"""Fused Pallas TPU path-tracking kernel: the production HC hot loop.

TPU-native equivalent of the reference's fused CUDA kernel
(gpu-kernels/kernel_GPUHC_trifocal_2op1p_30x30_PH_CodeOpt_TrunPaths.cu:66-290),
re-designed for the TPU's execution model rather than translated:

* The reference maps one warp of 30 threads to one path; here one Pallas
  grid tile owns a *lane vector* of ``tile`` paths, every array is stored
  batch-last (rows x lanes) so each row operation is a full-width VPU op,
  and the whole RK4 + Newton + adaptive-dt loop runs inside one kernel so
  all state stays VMEM-resident (the reference's shared-memory residency,
  ...TrunPaths.cu:84-124).  A tile whose paths are all converged / pruned /
  diverged skips the remaining iterations -- the TPU analogue of retired
  CUDA blocks freeing their SM.

* Indexed polynomial evaluation (gpu-idx-evals/...LimUnroll_L2Cache.cuh)
  becomes a short chain of constant matmuls on the MXU plus three fused
  complex lane products, with every constant section padded to sublane
  (8-row) alignment so no slice needs a Mosaic shift:

    fac = OHX @ [x; 1]      one gather matmul; rows = [qm_a|cm_a|qm_b|
                            cm_b|  |cm_c] so ONE complex product yields
                            all quadratic monomials AND the cm_a*cm_b
                            halves of the cubics, and a second one
                            finishes the cubics.
    px  = [G2 @ x2; G3 @ x3]   monomial -> (pair, monomial)-combo gathers,
                            written into one contiguous VMEM scratch.
    pxv = P(t) * px         ONE wide complex product for Hx *and* H/Ht.
    hx  = CHX @ pxv[:K2];  rhs = CHT(+/-) @ pxv[K2:]

  where P(t) is the per-path parameter-pair product vector.  p(t) =
  start + t*diff is affine in t (the TPU-native sharpening of strategy
  (PH), README.md:5), so P(t) = A t^2 + B t + C with per-path constants
  hoisted out of the loop; inside the loop P is (re)filled ONCE PER
  DISTINCT t VALUE -- 4 fills per HC step (t, t+h/2, t+h for RK, and the
  corrector's H-polynomial at t+h) serve all ~7 evaluations, the analogue
  of the reference hoisting compute_param_homotopy out of the corrector
  (...TrunPaths.cu:217-224 reuses s_param_homotopy).  -Ht needs the pair
  derivative 2At+B and a sign flip; the flip is baked into a negated
  constant fold matrix (chtneg) so it costs nothing.

* The 30x30 complex solve (dev-cgesv-batched-small.cuh:38-107) uses the
  static elimination schedule of ops/schedule.py: the Jacobian has a fixed
  170-of-900 sparsity pattern, so partial pivoting only ever searches the
  structurally-nonzero candidate rows of each column, cutting ~6x of the
  dense elimination flops.  The pivot metric |Re|+|Im| matches the
  reference (:55); variables are globally re-ordered by elimination
  position so every step's active columns form an aligned contiguous tail
  slice.  Back-substitution runs in a persistent (width, T) scratch so no
  per-step concatenations materialise.

Path truncation (TrunPaths), end-zone clamping, corrector tolerances and
the adaptive-dt policy mirror ops/tracker.py (the tested oracle) line for
line; see its docstring for the reference citations.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trifocal_pose_estimation_using_improved_gpuhc_tpu.models.trifocal import (
    TrifocalProblem,
)
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import reduce as redu
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import schedule as sched
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops.tracker import TrackResult
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import HCConfig

_HIGH = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), precision=_HIGH,
        preferred_element_type=jnp.float32,
    )


def _bdot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _split3(x):
    """Exact 3-term bf16 decomposition of f32: x == h + l1 + l2.

    All constant matrices here are exactly representable in bf16 (one-hot
    gathers and small-integer coefficient folds), so C@x computed as three
    1-pass bf16 matmuls accumulated in f32 reproduces the f32 product to
    within final-rounding -- at half the cost of Precision.HIGHEST, which
    Mosaic lowers to ~6 bf16 passes (measured 7.4us -> 4.0us for the
    evaluator's five matmuls at tile=256).
    """
    h = x.astype(jnp.bfloat16)
    r1 = x - h.astype(jnp.float32)
    l1 = r1.astype(jnp.bfloat16)
    l2 = (r1 - l1.astype(jnp.float32)).astype(jnp.bfloat16)
    return (h, l1, l2)


def _sdot(cb, x):
    h, l1, l2 = _split3(x)
    return _bdot(cb, h) + _bdot(cb, l1) + _bdot(cb, l2)


def _kdot(cb3, x):
    """split3 matmul with the three terms CONCATENATED along K.

    cb3 = [cb | cb | cb] (K tripled).  The matmul's f32 K-accumulation
    performs the h + l1 + l2 reduction for free, saving both full-size
    output adds and two matmul issues.  The association of the three
    exact split terms may differ from _sdot's two vector adds, so
    results agree only to final-rounding (~1 ulp) -- the same precision
    class as split3 itself; convergence stats are re-validated on TPU
    whenever the eval path changes (tools/reconcile_stats.py).
    """
    h, l1, l2 = _split3(x)
    return _bdot(cb3, jnp.concatenate([h, l1, l2], axis=0))


def _kdot2(cb3, x):
    """2-term K-concat split (split3_rk2 predictor): reuse the first two
    K segments of the tripled constant."""
    k = cb3.shape[1] // 3
    h = x.astype(jnp.bfloat16)
    l1 = (x - h.astype(jnp.float32)).astype(jnp.bfloat16)
    return _bdot(cb3[:, : 2 * k], jnp.concatenate([h, l1], axis=0))


def _sdot2(cb, x):
    """2-term bf16 split (~16 significant bits): RK-predictor-only mode
    ("split3_rk2"); the Newton corrector must keep the exact 3-term form."""
    h = x.astype(jnp.bfloat16)
    l1 = (x - h.astype(jnp.float32)).astype(jnp.bfloat16)
    return _bdot(cb, h) + _bdot(cb, l1)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cmul_w(a, b, T):
    """Complex multiply on lane-wide [re|im] arrays: (K, 2T) x (K, 2T)."""
    ar, ai = a[:, :T], a[:, T:]
    br, bi = b[:, :T], b[:, T:]
    return jnp.concatenate([ar * br - ai * bi, ar * bi + ai * br], axis=1)


# ---------------------------------------------------------------------------
# Compile-time constants derived from the problem + solve schedule.
# ---------------------------------------------------------------------------


def _onehot(idx: np.ndarray, n: int) -> np.ndarray:
    m = np.zeros((len(idx), n), np.float32)
    m[np.arange(len(idx)), idx] = 1.0
    return m


def _ceil8(n: int) -> int:
    return -(-n // 8) * 8


@dataclasses.dataclass(frozen=True)
class FamMeta:
    """Kernel metadata for one batched elimination family (ops/reduce.py).

    m rows of a level-0 family are laid out SLOT-MAJOR: group q's j-th row
    (ascending original order) sits at ``src_row_lo + j*nG + q`` so every
    per-slot tensor is one contiguous (nG, cols, T) slice -- no strided or
    4D access, only shapes the Mosaic backend already lowers.
    """

    g: int                       # rows per group
    l: int                       # local columns (pivots) per group
    nG: int                      # groups in the family
    src_row_lo: int              # m row base (level-0 families); -1 consumer
    src_fam: int                 # producer family index (consumers); -1
    src_slot_lo: Tuple[int, ...]  # per slot: start row into producer outs
    blk: Tuple[int, int]         # m col block holding the local columns
    blk_extra: bool              # block holds live cols beyond own locals
    base: int                    # col-position base == sv save-slot base
    # Step k's local columns sit at positions base + k*nG + q by
    # construction, so column selection inside the kernel is an iota
    # diagonal -- no captured constant matrices (Mosaic requires kernel
    # constants to arrive as inputs).
    # m2 stores: per output slot s, runs of (dst_lo, dst_hi, src_lo) group
    # indices; None when the outputs feed a later family instead.
    out_runs: Optional[Tuple[Tuple[Tuple[int, int, int], ...], ...]]


@dataclasses.dataclass(frozen=True)
class ReducedMeta:
    """Condensed-solve metadata: families + the reduced system plan.

    The reduced system occupies m rows [0:n2] at columns
    [col_off:width] (the surviving columns were permuted to the tail),
    so no extra scratch is needed: family stages read original rows
    first, then overwrite the head rows with the compacted system.
    """

    n2: int
    col_off: int
    fams: Tuple[FamMeta, ...]
    red_steps: Tuple[Tuple[int, Tuple[Tuple[int, int], ...], int], ...]
    red_plan: Tuple[Tuple, ...]  # grouped steps, as FusedConstants.elim_plan


def _group_plan(flat):
    """Group consecutive steps with identical single-run windows (shared
    load/store); mirrors FusedConstants.build's elimination plan."""
    plan: List[Tuple] = []
    i = 0
    while i < len(flat):
        sc, runs, lo, fresh, last = flat[i]
        j = i + 1
        while (j < len(flat) and len(runs) == 1
               and flat[j][1] == runs and flat[j][2] == lo):
            j += 1
        plan.append((tuple(flat[i:j]), runs, lo))
        i = j
    return tuple(plan)


def _fresh_last_flags(steps):
    """Annotate (s, runs, lo) steps with fresh/last used-mask flags."""
    rows_of = [set(r for a, b in runs for r in range(a, b))
               for _, runs, _ in steps]
    flat: List[Tuple] = []
    for si, (sc, runs, lo) in enumerate(steps):
        before = set().union(*rows_of[:si]) if si else set()
        after = (set().union(*rows_of[si + 1:])
                 if si + 1 < len(steps) else set())
        flat.append((sc, runs, lo,
                     not (rows_of[si] & before),
                     not (rows_of[si] & after)))
    return flat


def _reduced_layout(plan: redu.ReductionPlan):
    """Derive (perm, row_order, ReducedMeta) from a reduction plan.

    Returns None when the plan's shape falls outside what the kernel
    supports (then the plain schedule path is used): exactly two levels,
    no level-0 passthrough rows, family-major group order consistent
    with the oracle's sorted order, 8-aligned group-pivot count, and
    consumer families reading contiguous slot runs of ONE producer.
    """
    n = plan.n
    if plan.num_levels != 2 or any(f.level > 1 for f in plan.families):
        return None
    fams0 = [f for f in plan.families if f.level == 0]
    fams1 = [f for f in plan.families if f.level == 1]
    groups0 = sorted(
        (g for f in fams0 for g in f.groups), key=lambda g: g.rows
    )
    if [g for f in fams0 for g in f.groups] != groups0:
        return None
    if sorted(r for g in groups0 for r in g.rows) != list(range(n)):
        return None
    groups1 = sorted(
        (g for f in fams1 for g in f.groups), key=lambda g: g.rows
    )
    if [g for f in fams1 for g in f.groups] != groups1:
        return None

    kernel_fams = fams0 + fams1
    fam_base: List[int] = []
    base = 0
    perm = np.empty(n, np.int32)
    for f in kernel_fams:
        fam_base.append(base)
        nG = len(f.groups)
        for k in range(f.l):
            for q, gr in enumerate(f.groups):
                perm[base + k * nG + q] = gr.local_cols[k]
        base += f.l * nG
    col_off = base
    n2 = plan.schedule.n
    if col_off % 8 or col_off + n2 != n:
        return None
    for j, c in enumerate(plan.final_cols):
        perm[col_off + j] = c
    pos_of_var = np.argsort(perm).astype(np.int32)

    # m row order, slot-major per level-0 family.
    row_order: List[int] = []
    src_row_lo: List[int] = []
    for f in fams0:
        src_row_lo.append(len(row_order))
        for j in range(f.g):
            for gr in f.groups:
                row_order.append(gr.rows[j])
    row_order_a = np.array(row_order, np.int32)

    # Level-0 global (group-major) output indexing, for provenance.
    out_start: List[int] = []
    acc = 0
    for gr in groups0:
        out_start.append(acc)
        acc += len(gr.rows) - len(gr.local_cols)
    total_outs0 = acc
    gi_of_group = {gr.rows: gi for gi, gr in enumerate(groups0)}
    # fam-of-out and slot-major index per level-0 out.
    fam_of_out: dict = {}
    for f0i, f in enumerate(fams0):
        nG = len(f.groups)
        for q, gr in enumerate(f.groups):
            gi = gi_of_group[gr.rows]
            for s in range(f.g - f.l):
                fam_of_out[out_start[gi] + s] = (f0i, s * nG + q, s, q)

    consumed_by: dict = {}
    for f1i, f in enumerate(fams1):
        for gr in f.groups:
            for r in gr.rows:
                if r >= total_outs0:
                    return None  # level-1 passthrough input unsupported
                consumed_by[r] = f1i

    # Final rows: level-1 outs (global group order) then passthrough
    # level-1 inputs ascending (ops/reduce._level_output_refs).
    n_outs1 = sum(
        len(g.rows) - len(g.local_cols) for f in fams1 for g in f.groups
    )
    passthrough1 = [r for r in range(total_outs0) if r not in consumed_by]
    final_of_input1 = {
        r: n_outs1 + i for i, r in enumerate(passthrough1)
    }
    order2 = sched.find_interval_row_order(plan.schedule)
    pos_of_row2 = np.argsort(order2)

    def runs_of(pairs):
        """(dst_pos, src_idx) pairs -> maximal (dst_lo, dst_hi, src_lo)
        runs where consecutive sources land on consecutive positions."""
        pairs = sorted(pairs, key=lambda t: t[1])
        runs: List[List[int]] = []
        for dst, src in pairs:
            if runs and src == runs[-1][3] + 1 and dst == runs[-1][1]:
                runs[-1][1] += 1
                runs[-1][3] = src
            else:
                runs.append([dst, dst + 1, src, src])
        return tuple((lo, hi, s0) for lo, hi, s0, _ in runs)

    metas: List[FamMeta] = []
    level_pats = plan.level_patterns
    for fi, f in enumerate(kernel_fams):
        nG = len(f.groups)
        # Kernel compaction supports one survivor (any g) or the sorted
        # two-survivor form of (3, 1) groups.
        if not (f.g - f.l == 1 or (f.l == 1 and f.g == 3)):
            return None
        # Structural column block of the family's inputs.
        own_pos = set(
            int(pos_of_var[c]) for gr in f.groups for c in gr.local_cols
        )
        needed = set(own_pos)
        extra = False
        for gr in f.groups:
            for r in gr.rows:
                for ocol in level_pats[f.level][r]:
                    p = int(pos_of_var[ocol])
                    if p < col_off:
                        needed.add(p)
                        if p not in own_pos:
                            extra = True
        blo = (min(needed) // 8) * 8
        bhi = _ceil8(max(needed) + 1)
        if bhi > col_off:
            return None
        bw = bhi - blo
        del bw
        # Verify the iota-diagonal invariant the kernel relies on.
        for k in range(f.l):
            for q, gr in enumerate(f.groups):
                if int(pos_of_var[gr.local_cols[k]]) != \
                        fam_base[fi] + k * nG + q:
                    return None
        if f.level == 0:
            sfam, slot_lo = -1, ()
        else:
            # Consumer: every slot must be one contiguous run of a single
            # producer family's slot-major outputs.
            prods = {
                fam_of_out[r][0] for gr in f.groups for r in gr.rows
            }
            if len(prods) != 1:
                return None
            sfam = prods.pop()
            pf = fams0[sfam]
            slot_lo_l: List[int] = []
            for j in range(f.g):
                sm = [fam_of_out[gr.rows[j]][1] for gr in f.groups]
                if sm != list(range(sm[0], sm[0] + nG)):
                    return None
                if sm[0] // len(pf.groups) != \
                        (sm[0] + nG - 1) // len(pf.groups):
                    return None  # run crosses producer slot tensors
                slot_lo_l.append(sm[0])
            slot_lo = tuple(slot_lo_l)
            # The consumer's column block must sit inside the producer's
            # (its input values only exist over the producer's block).
            if blo < metas[sfam].blk[0] or bhi > metas[sfam].blk[1]:
                return None
        # m2 output runs (None when consumed by a later family).
        first_out = (
            out_start[gi_of_group[f.groups[0].rows]]
            if f.level == 0 else None
        )
        if f.level == 0 and first_out in consumed_by:
            if any(
                out_start[gi_of_group[gr.rows]] + s not in consumed_by
                for gr in f.groups for s in range(f.g - f.l)
            ):
                return None  # partially consumed family unsupported
            out_runs = None
        else:
            out_runs_l: List[Tuple] = []
            for s in range(f.g - f.l):
                pairs = []
                for q, gr in enumerate(f.groups):
                    if f.level == 0:
                        o = out_start[gi_of_group[gr.rows]] + s
                        fr = final_of_input1[o]
                    else:
                        # Level-1 outs precede passthrough in final rows.
                        prior = sum(
                            len(g2.rows) - len(g2.local_cols)
                            for g2 in groups1[:groups1.index(gr)]
                        )
                        fr = prior + s
                    pairs.append((int(pos_of_row2[fr]), q))
                out_runs_l.append(runs_of(pairs))
            out_runs = tuple(out_runs_l)
        metas.append(FamMeta(
            g=f.g, l=f.l, nG=nG,
            src_row_lo=src_row_lo[fi] if f.level == 0 else -1,
            src_fam=sfam if f.level > 0 else -1,
            src_slot_lo=slot_lo if f.level > 0 else (),
            blk=(blo, bhi), blk_extra=extra,
            base=fam_base[fi], out_runs=out_runs,
        ))

    red_steps = tuple(
        (j, sched.row_runs(st.rows, pos_of_row2), (j // 8) * 8)
        for j, st in enumerate(plan.schedule.steps)
    )
    red_plan = _group_plan(_fresh_last_flags(red_steps))
    meta = ReducedMeta(
        n2=n2, col_off=col_off, fams=tuple(metas),
        red_steps=red_steps, red_plan=red_plan,
    )
    return perm, row_order_a, meta


@dataclasses.dataclass(frozen=True)
class FusedConstants:
    """All numpy constants consumed by the kernel (see build()).

    Section layout (all 8-row aligned so every kernel slice is sublane
    aligned): the front gather ohx23 has three blocks of ``sec_a`` rows,
      A = [qm_a (m2) | pad | cm_a (m3) | pad]      rows 0      : sec_a
      B = [qm_b      | pad | cm_b      | pad]      rows sec_a  : 2*sec_a
      C = [ zeros (qpad)   | cm_c      | pad]      rows 2*sec_a: 3*sec_a
    so u = A-part * B-part yields the quadratic monomials in u[:qpad] and
    the cm_a*cm_b halves in u[qpad:], and x3 = u[qpad:] * fac[C + qpad:].
    Combo space is [Hx combos (k2p rows) | H/Ht combos (k3p rows)].
    """

    perm: np.ndarray          # (30,) position -> original var
    pos_of_var: np.ndarray    # (30,) original var -> position
    ohx23: np.ndarray         # (3*sec_a, n_vars+1) front factor gather
    ohx2g: np.ndarray         # (k2p, qpad) quad monomial -> Hx combo gather
    ohx3g: np.ndarray         # (k3p, cpad) cubic monomial -> H/Ht combo gather
    ohq23: np.ndarray         # (k2p + k3p, Q) param-pair -> combo gather
    chx: np.ndarray           # (NNZ, k2p) combo -> Hx nonzero weights
    cht: np.ndarray           # (n, k3p)  combo -> H/Ht equation weights
    chtneg: np.ndarray        # -cht (folds the -Ht sign for free)
    ohg: np.ndarray           # (kp, sec_a) merged [x2|x3] -> combo gather
    fold_h: np.ndarray        # (nzp+np8, kp) block-diag [chx; cht]
    fold_t: np.ndarray        # (nzp+np8, kp) block-diag [chx; chtneg]
    nzp: int                  # 8-aligned Hx-nonzero rows in fold outputs
    row_order: np.ndarray     # (30,) row position -> original equation
    row_runs_v: Tuple[Tuple, ...]  # per-row-position value runs (src_lo, src_hi, dst_col)
    steps: Tuple[Tuple, ...]  # (pos, row runs ((lo,hi),...), col_lo)
    elim_plan: Tuple[Tuple, ...]   # steps + (fresh, last) used-mask flags
    depth_rows: Tuple[int, ...]    # permuted positions of depth vars 0..7
    reduced: Optional[ReducedMeta]  # condensed-solve metadata (None =
    # plain schedule path; steps/elim_plan are then empty)
    sec_a: int                # rows per front block (qpad + cpad)
    qpad: int                 # 8-aligned quad-monomial section rows
    cpad: int                 # 8-aligned cubic-monomial section rows
    k2p: int                  # 8-aligned Hx combo rows
    k3p: int                  # 8-aligned H/Ht combo rows
    m2: int
    m3: int
    k2: int
    k3: int
    q: int
    nnz: int

    @property
    def kp(self) -> int:
        return self.k2p + self.k3p

    @classmethod
    def build(cls, problem: TrifocalProblem,
              solver: str = "reduced") -> "FusedConstants":
        f = problem.factored
        n = problem.num_vars
        nnz_total = f.hx_C.shape[1]
        pattern = f.hx_scatter.reshape(n, n) != nnz_total
        s = sched.build_schedule(pattern)

        # Condensed layout (ops/reduce.py): batched group families +
        # compacted reduced system.  Falls back to the plain schedule when
        # the pattern has no kernel-supported condensation.
        reduced = None
        if solver == "reduced":
            plan = redu.build_reduction(pattern)
            layout = _reduced_layout(plan) if plan is not None else None
            if layout is not None:
                r_perm, r_row_order, reduced = layout

        if reduced is not None:
            perm = r_perm
        else:
            perm = np.array([st.col for st in s.steps], np.int32)
        pos_of_var = np.argsort(perm).astype(np.int32)

        def pvar(v):  # permute a var index, keeping the homogeneous slot
            return int(pos_of_var[v]) if v < n else v

        pv = np.vectorize(pvar)
        m2, m3, q = len(f.qm_a), len(f.cm_a), len(f.pp_a)
        k2, k3 = len(f.hx_q), len(f.ht_q)
        qpad, cpad = _ceil8(m2), _ceil8(m3)
        sec_a = qpad + cpad
        k2p, k3p = _ceil8(k2), _ceil8(k3)

        def block(qm, cm, ones_q=False):
            b = np.zeros((sec_a, n + 1), np.float32)
            if qm is not None:
                b[:m2] = _onehot(pv(qm), n + 1)
            elif ones_q:
                # Block C's quad section picks the homogeneous-1 column so
                # fac_C[:qpad] == 1+0i and ONE complex product u * fac_C
                # yields [x2 | x3] contiguously (merged-eval layout).
                b[:qpad, n] = 1.0
            b[qpad:qpad + m3] = _onehot(pv(cm), n + 1)
            return b

        ohx23 = np.concatenate(
            [block(f.qm_a, f.cm_a), block(f.qm_b, f.cm_b),
             block(None, f.cm_c, ones_q=True)]
        ).astype(np.float32)

        ohx2g = np.zeros((k2p, qpad), np.float32)
        ohx2g[:k2, :m2] = _onehot(f.hx_m, m2)
        ohx3g = np.zeros((k3p, cpad), np.float32)
        ohx3g[:k3, :m3] = _onehot(f.ht_m, m3)
        ohq23 = np.zeros((k2p + k3p, q), np.float32)
        ohq23[:k2] = _onehot(f.hx_q, q)
        ohq23[k2p:k2p + k3] = _onehot(f.ht_q, q)

        # Row (equation) permutation making every step's candidate set one
        # contiguous slice of rows (verified single-run for this problem);
        # the condensed layout instead stripes family groups slot-major.
        if reduced is not None:
            row_order = r_row_order
        else:
            row_order = sched.find_interval_row_order(s)
        pos_of_row = np.argsort(row_order).astype(np.int32)

        # Canonical Hx nonzero order: sorted by (row position, permuted
        # column) so each row's values form contiguous source slices.
        entries = []  # (row position, permuted col, slot)
        for flat, slot in enumerate(f.hx_scatter):
            if slot == nnz_total:
                continue
            eq, var = divmod(flat, n)
            entries.append(
                (int(pos_of_row[eq]), int(pos_of_var[var]), int(slot))
            )
        entries.sort()
        order = np.array([e[2] for e in entries], np.int32)
        chx = np.zeros((nnz_total, k2p), np.float32)
        chx[:, :k2] = f.hx_C.T[order]          # (NNZ, K2) reordered
        cht = np.zeros((n, k3p), np.float32)
        cht[:, :k3] = f.ht_C.T[row_order]      # rows permuted

        # Merged-eval constants: one gather over the contiguous [x2 | x3]
        # front (rows [0:m2] pick x2, [k2p:k2p+k3] pick x3 at qpad offset)
        # and one block-diagonal fold emitting [hx | rhs] in a single
        # matmul.  Cuts the evaluator's constant-matmul count from 5 to 3
        # (x3 bf16 split passes) at the cost of some zero MXU tiles.
        ohg = np.zeros((k2p + k3p, sec_a), np.float32)
        ohg[:k2, :m2] = _onehot(f.hx_m, m2)
        ohg[k2p:k2p + k3, qpad:qpad + m3] = _onehot(f.ht_m, m3)
        nzp = _ceil8(nnz_total)
        np8 = _ceil8(n)
        fold_h = np.zeros((nzp + np8, k2p + k3p), np.float32)
        fold_h[:nnz_total, :k2p] = chx
        fold_h[nzp:nzp + n, k2p:] = cht
        fold_t = fold_h.copy()
        fold_t[nzp:nzp + n, k2p:] = -cht

        # Row assembly program: per row position, the maximal contiguous
        # value runs (src_lo, src_hi, dst_col); zeros and the rhs column are
        # bulk-initialised, so only true nonzeros are written individually.
        row_runs_v: List[Tuple] = []
        base = 0
        for rp in range(n):
            cols = [c for (e, c, _) in entries if e == rp]
            runs: List[Tuple[int, int, int]] = []
            i = 0
            while i < len(cols):
                j = i
                while j + 1 < len(cols) and cols[j + 1] == cols[j] + 1:
                    j += 1
                runs.append((base + i, base + j + 1, cols[i]))
                i = j + 1
            base += len(cols)
            row_runs_v.append(tuple(runs))
        assert base == nnz_total

        depth_rows = tuple(int(pos_of_var[v]) for v in range(8))

        # Elimination steps (plain-schedule path only): position s
        # eliminates permuted column s; candidate rows become contiguous
        # runs under row_order; the active column slice starts at the
        # 8-aligned floor of s.  fresh: no candidate row was a candidate
        # of any earlier step, so the used-mask is statically all-zero
        # (skip its load + where); last: no candidate row appears in any
        # later step, so the updated used-mask is never read again (skip
        # its store).  Consecutive steps with IDENTICAL single-run windows
        # share one load/store (the dense tail eliminates 6 columns from
        # the same block).  A full levelled batching of row-disjoint steps
        # WITHOUT compaction was measured slower end-to-end on v5e (745 vs
        # 693 ms per H=100 round); the condensed path (ops/reduce.py)
        # differs by compacting dead rows out of every later window.
        if reduced is not None:
            steps: Tuple[Tuple, ...] = ()
            plan: Tuple[Tuple, ...] = ()
        else:
            steps = tuple(
                (si, sched.row_runs(st.rows, pos_of_row), (si // 8) * 8)
                for si, st in enumerate(s.steps)
            )
            plan = _group_plan(_fresh_last_flags(steps))
        return cls(
            perm=perm,
            pos_of_var=pos_of_var,
            ohx23=ohx23,
            ohx2g=ohx2g,
            ohx3g=ohx3g,
            ohq23=ohq23,
            chx=chx,
            cht=cht,
            chtneg=(-cht).astype(np.float32),
            ohg=ohg,
            fold_h=fold_h,
            fold_t=fold_t,
            nzp=nzp,
            row_order=row_order,
            row_runs_v=tuple(row_runs_v),
            steps=steps,
            elim_plan=plan,
            depth_rows=depth_rows,
            reduced=reduced,
            sec_a=sec_a,
            qpad=qpad,
            cpad=cpad,
            k2p=k2p,
            k3p=k3p,
            m2=m2,
            m3=m3,
            k2=k2,
            k3=k3,
            q=q,
            nnz=nnz_total,
        )


# ---------------------------------------------------------------------------
# Kernel body pieces (pure functions of values + scratch refs).
# ---------------------------------------------------------------------------


def _quad(a, b, cc, t):
    """A*t^2 + B*t + C as two FMAs; t real broadcast row, coeffs (K, ...)."""
    return (a * t + b) * t + cc


def _fill_P(c: FusedConstants, P, agq, t_w, rk: bool, basis: str = "abc"):
    """Fill the cached parameter-product vector P at one t value.

    agq: (3, kp, 2T) hoisted quadratic coefficients per combo, gathered
    once per tile -- (A, B, C) of A t^2 + B t + C under basis "abc",
    (E, F, G) of t^2 E + t(1-t) F + (1-t)^2 G under basis "efg"
    (HCConfig.pair_coef_basis; "efg" is endpoint-exact).  The Hx half
    [0:k2p] always takes the pair product P_q(t); the H/Ht half takes
    the pair DERIVATIVE for RK stages (rk=True;
    ...LimUnroll_L2Cache.cuh:109-118 accumulates against diffParams) and
    P_q(t) itself for the corrector's H (rk=False).
    """
    k2p = c.k2p
    if basis == "efg":
        # Precompute the three quadratic basis rows ONCE per fill (they
        # broadcast over all combo rows): P = t^2 E + tv F + v^2 G costs
        # one mul + two FMAs per row, and at t = 1 the rows are exactly
        # (1, 0, 0) so P == E bit-exactly (the endpoint-exactness that
        # motivates this basis; see HCConfig.pair_coef_basis).
        v_w = 1.0 - t_w
        tt = t_w * t_w
        tv = t_w * v_w
        vv = v_w * v_w

        def pq(sl):
            return tt * agq[0, sl] + (tv * agq[1, sl] + vv * agq[2, sl])

        P[:k2p] = pq(slice(0, k2p))
        if rk:
            # dP/dt = 2t E + (1 - 2t) F - 2v G, same broadcast-row trick.
            t2 = 2.0 * t_w
            sl = slice(k2p, None)
            P[k2p:] = (t2 * agq[0, sl] + ((1.0 - t2) * agq[1, sl]
                                          - (2.0 * v_w) * agq[2, sl]))
        else:
            P[k2p:] = pq(slice(k2p, None))
        return
    P[:k2p] = _quad(agq[0, :k2p], agq[1, :k2p], agq[2, :k2p], t_w)
    if rk:
        P[k2p:] = 2.0 * agq[0, k2p:] * t_w + agq[1, k2p:]
    else:
        P[k2p:] = _quad(agq[0, k2p:], agq[1, k2p:], agq[2, k2p:], t_w)


def _eval_core(c: FusedConstants, consts, P, xp_w, T: int,
               want_h: bool, need_hx: bool = True, dot=_dot):
    """Evaluate Hx nonzeros and the rhs (H if want_h else -Ht) at (x, P(t)).

    Semantics of gpu-idx-evals/...LimUnroll_L2Cache.cuh:57-148 in the
    monomial-factored form (models/trifocal.py).  Every array carries the
    complex planes side by side in the lane axis ([re | im], width 2T), so
    each complex x real-constant matmul is ONE MXU op; all row slices are
    8-aligned by construction (FusedConstants section layout).  The combo
    products stay in registers end to end (an earlier VMEM px scratch
    cost a 1.3 MB store + reload per evaluation).

    xp_w: (31, 2T) homogeneous solution; P: (kp, 2T) cached parameter
    products for this t value (see _fill_P).
    Returns (hx (NNZ, 2T) or None, rhs (n, 2T)) wide arrays.
    """
    (ohx23, ohx2g, ohx3g, chx, cht, chtneg) = consts
    a = c.sec_a
    qp = c.qpad
    k2p = c.k2p

    fac = dot(ohx23, xp_w)                      # (3*sec_a, 2T)
    u = _cmul_w(fac[:a], fac[a:2 * a], T)       # x2 in [:qpad], ab in [qpad:]
    x3 = _cmul_w(u[qp:], fac[2 * a + qp:], T)   # (cpad, 2T) cubic monomials
    px3 = dot(ohx3g, x3)                        # (k3p, 2T) H/Ht combos
    rhs = dot(cht if want_h else chtneg, _cmul_w(P[k2p:], px3, T))
    if not need_hx:
        return None, rhs
    px2 = dot(ohx2g, u[:qp])                    # (k2p, 2T) Hx combos
    hx = dot(chx, _cmul_w(P[:k2p], px2, T))
    return hx, rhs


def _eval_core_gathered(c: FusedConstants, consts, P, xp_w, T: int,
                        want_h: bool, need_hx: bool = True, dot=_dot):
    """Gather-merged evaluator: 4 constant matmuls instead of 5.

    Block C's quad section resolves to 1+0i (FusedConstants.build), so
    ONE complex product z = u * fac_C yields [x2 | x3] contiguously and
    the combined one-hot gather ``ohg`` emits all 624 combos in ONE
    matmul (replacing ohx2g + ohx3g); the hx/rhs folds stay the classic
    matrices.  Although every step is ALGEBRAICALLY identical to
    _eval_core (one-hot rows, multiply by exact 1+0i), results differ
    from classic at the ~1-ulp level: XLA duplicates elementwise
    producers into consumers and contracts mul/add chains into FMAs
    per fusion context, so the recomputed ``u`` inside the z product
    rounds differently (measured 2e-6 abs inside the kernel, CPU
    interpret).  Bit-reproducibility across restructured graphs is not
    an XLA contract -- adoption of ANY eval_structure is therefore
    gated on convergence statistics (tools/reconcile_stats.py), like an
    eval-precision change.
    """
    (ohx23, ohg, chx, cht, chtneg) = consts
    a = c.sec_a
    fac = dot(ohx23, xp_w)                      # (3*sec_a, 2T)
    u = _cmul_w(fac[:a], fac[a:2 * a], T)       # [x2 | ab]
    z = _cmul_w(u, fac[2 * a:], T)              # [x2 | x3]
    px = dot(ohg, z)                            # (kp, 2T) all combos
    pxv = _cmul_w(P, px, T)
    rhs = dot(cht if want_h else chtneg, pxv[c.k2p:])
    if not need_hx:
        return None, rhs
    hx = dot(chx, pxv[:c.k2p])
    return hx, rhs


def _eval_core_merged(c: FusedConstants, consts, P, xp_w, T: int,
                      want_h: bool, need_hx: bool = True, dot=_dot,
                      dot_g=None, dot_f=None):
    """Merged-form evaluator: 3 constant matmuls instead of 5.

    Same math as _eval_core up to compiler rounding (~1 ulp of row
    magnitude; see _eval_core_gathered for why XLA does not guarantee
    bit-reproducibility across restructured graphs) -- same precision
    class as split3 itself, so adoption is gated on convergence
    statistics (tools/reconcile_stats.py), like any eval-precision
    change.
    Structure: one complex product z = u * fac_C yields [x2 | x3]; the
    combined gather ``ohg`` emits all combos; ONE wide P product and the
    block-diagonal fold emit hx and rhs together.  The bet: fewer op
    issues beat the extra zero MXU tiles on v5e (the eval phase is
    issue-bound, ~2x above its flop floor).  A/B via
    tools/microbench_fused phases evals (classic) / evalg (gathered) /
    evalm (merged) / evalk (merged + K-concat gathers) and
    HCConfig.eval_structure.

    Returns (out (nzp+np8, 2T) holding hx rows [0:nnz], rhs (n, 2T)).
    """
    (ohx23, ohg, fold_h, fold_t) = consts
    a = c.sec_a
    n = c.cht.shape[0]
    dg = dot if dot_g is None else dot_g
    df = dot if dot_f is None else dot_f

    fac = dg(ohx23, xp_w)                       # (3*sec_a, 2T)
    u = _cmul_w(fac[:a], fac[a:2 * a], T)       # [x2 | ab]
    z = _cmul_w(u, fac[2 * a:], T)              # [x2 | x3]
    px = dg(ohg, z)                             # (kp, 2T) all combos
    pxv = _cmul_w(P, px, T)
    out = df(fold_h if want_h else fold_t, pxv)
    rhs = out[c.nzp:c.nzp + n]
    if not need_hx:
        return None, rhs
    return out, rhs


def _assemble(c: FusedConstants, m, hx, rhs, T: int):
    """Write the augmented system into the wide m scratch ref.

    Layout: rows = permuted equations, columns = [permuted vars | rhs |
    pad], lanes = [re | im] (so every nonzero run is ONE write -- the
    per-plane version measured 7.5us per assembly, dominating the solve).
    The zero skeleton is one broadcast store (no concatenated temporary).
    """
    n = rhs.shape[0]
    m[:] = jnp.zeros((n, n + 2, 2 * T), jnp.float32)
    m[:, n:n + 1] = jnp.expand_dims(rhs, 1)
    for rp, runs in enumerate(c.row_runs_v):
        for (src_lo, src_hi, dst) in runs:
            w = src_hi - src_lo
            m[rp, dst:dst + w] = hx[src_lo:src_hi]


def _solve(c: FusedConstants, m, sv_re, sv_im, used, xe_re, xe_im, T: int,
           save=None):
    """Structured partial-pivoted elimination + back-substitution.

    Batched (lanes = paths) version of schedule.solve_numpy (or, on the
    condensed path, reduce.solve_numpy); the pivot metric and zero-pivot
    guard mirror dev-cgesv-batched-small.cuh:50-95.
    Returns dx (30, T) complex planes in permuted variable order.

    save = (foh, ffr, ffi) scratch refs: record each step's pivot one-hot
    and elimination multipliers so _resolve_rhs can re-apply the same
    factorization to a new right-hand side (frozen-Jacobian RK stages;
    plain-schedule path only).
    """
    if c.reduced is not None:
        _reduce_forward(c, m, sv_re, sv_im, used, T, save=save)
        return _reduce_backsub(c, sv_re, sv_im, xe_re, xe_im, T)
    _eliminate(c, m, sv_re, sv_im, used, T, save=save)
    return _backsub(c, sv_re, sv_im, xe_re, xe_im, T)


def _eliminate(c: FusedConstants, m, sv_re, sv_im, used, T: int, save=None):
    """Forward elimination over the static schedule (see _solve).

    Plan items hold one or more CONSECUTIVE steps sharing an identical
    candidate window; the window (and its used-mask) is loaded once, every
    step of the group updates the in-register values, and the result
    stores once.  fresh/last flags elide used-mask work where the rows are
    first/last touched.
    """
    n = len(c.perm)
    width = n + 2
    # Non-fresh steps may still contain rows first touched THIS step (mixed
    # candidate sets), so the mask must start at zero every solve.
    used[:] = jnp.zeros((n, T), jnp.float32)
    for group, runs, lo in c.elim_plan:
        nc = sum(hi - lo_r for lo_r, hi in runs)
        all_fresh = group[0][3]
        if len(runs) == 1:
            r0, r1 = runs[0]
            Mw = m[r0:r1, lo:width]
            ure = (jnp.zeros((nc, T), jnp.float32) if all_fresh
                   else used[r0:r1])
        else:
            Mw = jnp.concatenate([m[a:b, lo:width] for a, b in runs], axis=0)
            ure = (jnp.zeros((nc, T), jnp.float32) if all_fresh
                   else jnp.concatenate([used[a:b] for a, b in runs],
                                        axis=0))
        Mre = Mw[:, :, :T]
        Mim = Mw[:, :, T:]
        for s, _, _, fresh, last in group:
            jcol = s - lo
            cr = Mre[:, jcol, :]
            ci = Mim[:, jcol, :]
            metric = jnp.abs(cr) + jnp.abs(ci)
            if not fresh:
                metric = jnp.where(ure > 0.5, -1.0, metric)
            mx = jnp.max(metric, axis=0, keepdims=True)
            hit = metric >= mx
            rid = jax.lax.broadcasted_iota(jnp.int32, (nc, T), 0)
            first = jnp.min(jnp.where(hit, rid, nc), axis=0, keepdims=True)
            oh = (rid == first).astype(jnp.float32)          # (nc, T)
            prow_re = jnp.sum(oh[:, None, :] * Mre, axis=0)  # (w, T)
            prow_im = jnp.sum(oh[:, None, :] * Mim, axis=0)
            sv_re[s, lo:width] = prow_re
            sv_im[s, lo:width] = prow_im
            pr = prow_re[jcol:jcol + 1]
            pi = prow_im[jcol:jcol + 1]
            den = pr * pr + pi * pi
            den = jnp.where(den == 0.0, 1.0, den)
            fr, fi = _cmul(cr, ci, pr / den, -pi / den)
            nm = 1.0 - oh
            fr = fr * nm
            fi = fi * nm
            if save is not None:
                foh, ffr, ffi = save
                foh[s, :nc] = oh
                ffr[s, :nc] = fr
                ffi[s, :nc] = fi
            Mre = Mre - (fr[:, None, :] * prow_re[None]
                         - fi[:, None, :] * prow_im[None])
            Mim = Mim - (fr[:, None, :] * prow_im[None]
                         + fi[:, None, :] * prow_re[None])
            ure = ure + oh
        last_any = group[-1][4]
        new_w = jnp.concatenate([Mre, Mim], axis=2)
        off = 0
        for a, b in runs:
            w_r = b - a
            m[a:b, lo:width] = new_w[off:off + w_r]
            if not last_any:
                used[a:b] = ure[off:off + w_r]
            off += w_r


def _backsub(c: FusedConstants, sv_re, sv_im, xe_re, xe_im, T: int):
    """Back-substitution on saved pivot rows, reverse schedule order.

    The solution accumulates in the persistent (width, T) xe scratch; each
    step reads the aligned tail slice directly, so no per-step temporary
    concatenations materialise (the list-of-rows version cost ~30 extra
    vector copies per solve).
    """
    n = len(c.perm)
    width = n + 2
    xe_re[:] = jnp.zeros((width, T), jnp.float32)
    xe_im[:] = jnp.zeros((width, T), jnp.float32)
    xe_re[n:n + 1] = -jnp.ones((1, T), jnp.float32)
    for s in range(n - 1, -1, -1):
        lo = c.steps[s][2]
        prow_re = sv_re[s, lo:width]
        prow_im = sv_im[s, lo:width]
        tail_re = xe_re[lo:width]                       # xe[s] is still 0
        tail_im = xe_im[lo:width]
        ar, ai = _cmul(prow_re, prow_im, tail_re, tail_im)
        acc_re = jnp.sum(ar, axis=0, keepdims=True)
        acc_im = jnp.sum(ai, axis=0, keepdims=True)
        pr = prow_re[s - lo:s - lo + 1]
        pi = prow_im[s - lo:s - lo + 1]
        den = pr * pr + pi * pi
        den = jnp.where(den == 0.0, 1.0, den)
        xr, xi = _cmul(acc_re, acc_im, -pr / den, pi / den)
        xe_re[s:s + 1] = xr
        xe_im[s:s + 1] = xi
    return xe_re[:n], xe_im[:n]


def _fam_forward(c: FusedConstants, fam: FamMeta, m, sv_re, sv_im, T: int,
                 prev_outs, save=None):
    """One batched family elimination stage (condensed path).

    All nG groups run their l restricted-pivot steps together: the group
    axis rides the leading tensor dimension, so the whole family costs
    ONE stage of vector ops instead of l*nG sequential pivot stages.
    Numerics per group are exactly schedule.solve_numpy's restricted
    partial pivoting (ops/reduce.py module doc).  Surviving rows are
    compacted in ascending original order and either stored into the
    reduced system (out_runs) or handed to a consumer family as values.

    save = (foh, ffr, ffi): record step k's per-row-tensor one-hots and
    multipliers at first index [base + k*nG : base + k*nG + nG], second
    index j (family slots occupy [0:col_off), so these never collide
    with the reduced stages' save rows at [col_off:n)) -- see
    _reduce_resolve_rhs.
    """
    red = c.reduced
    co = red.col_off
    n = len(c.perm)
    width = n + 2
    wr = width - co
    nG, g, l = fam.nG, fam.g, fam.l
    blo, bhi = fam.blk
    bw = bhi - blo
    need_b_out = fam.out_runs is None  # a consumer reads the block part

    Wre: List = [None] * g
    Wim: List = [None] * g
    Bre: List = [None] * g
    Bim: List = [None] * g
    for j in range(g):
        if fam.src_row_lo >= 0:
            r0 = fam.src_row_lo + j * nG
            w = m[r0:r0 + nG, co:width]
            b = m[r0:r0 + nG, blo:bhi]
            Wre[j], Wim[j] = w[:, :, :T], w[:, :, T:]
            Bre[j], Bim[j] = b[:, :, :T], b[:, :, T:]
        else:
            pW, pB, pblk = prev_outs[fam.src_fam]
            pnG = pW[0][0].shape[0]
            si, off = divmod(fam.src_slot_lo[j], pnG)
            Wre[j] = pW[si][0][off:off + nG]
            Wim[j] = pW[si][1][off:off + nG]
            o = blo - pblk[0]
            Bre[j] = pB[si][0][off:off + nG, o:o + bw]
            Bim[j] = pB[si][1][off:off + nG, o:o + bw]

    used = [jnp.zeros((nG, T), jnp.float32) for _ in range(g)]
    ohs_first: List = []
    for k in range(l):
        # Step k's local columns are the diagonal block at positions
        # base + k*nG + q (layout invariant), so the selector is an
        # in-kernel iota compare, not a captured constant matrix.
        gi = jax.lax.broadcasted_iota(jnp.int32, (nG, bw, 1), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (nG, bw, 1), 1)
        sel = (ci == gi + (fam.base + k * nG - blo)).astype(jnp.float32)
        colr = [jnp.sum(Bre[j] * sel, axis=1) for j in range(g)]
        coli = [jnp.sum(Bim[j] * sel, axis=1) for j in range(g)]
        metric = [jnp.abs(colr[j]) + jnp.abs(coli[j]) for j in range(g)]
        if k:
            metric = [jnp.where(used[j] > 0.5, -1.0, metric[j])
                      for j in range(g)]
        mx = metric[0]
        for j in range(1, g):
            mx = jnp.maximum(mx, metric[j])
        notyet = jnp.ones((nG, T), jnp.float32)
        ohs: List = []
        for j in range(g):
            hit = (metric[j] >= mx).astype(jnp.float32) * notyet
            ohs.append(hit)
            notyet = notyet * (1.0 - hit)
        prw_re = ohs[0][:, None, :] * Wre[0]
        prw_im = ohs[0][:, None, :] * Wim[0]
        prb_re = ohs[0][:, None, :] * Bre[0]
        prb_im = ohs[0][:, None, :] * Bim[0]
        pr = ohs[0] * colr[0]
        pi = ohs[0] * coli[0]
        for j in range(1, g):
            prw_re = prw_re + ohs[j][:, None, :] * Wre[j]
            prw_im = prw_im + ohs[j][:, None, :] * Wim[j]
            prb_re = prb_re + ohs[j][:, None, :] * Bre[j]
            prb_im = prb_im + ohs[j][:, None, :] * Bim[j]
            pr = pr + ohs[j] * colr[j]
            pi = pi + ohs[j] * coli[j]
        sl = fam.base + k * nG
        sv_re[sl:sl + nG, co:width] = prw_re
        sv_im[sl:sl + nG, co:width] = prw_im
        sv_re[sl:sl + nG, blo:bhi] = prb_re
        sv_im[sl:sl + nG, blo:bhi] = prb_im
        den = pr * pr + pi * pi
        den = jnp.where(den == 0.0, 1.0, den)
        ir = pr / den
        ii = -pi / den
        upd_b = (k < l - 1) or need_b_out
        for j in range(g):
            fr, fi = _cmul(colr[j], coli[j], ir, ii)
            nm = 1.0 - ohs[j]
            fr = fr * nm
            fi = fi * nm
            if save is not None:
                foh, ffr, ffi = save
                foh[sl:sl + nG, j] = ohs[j]
                ffr[sl:sl + nG, j] = fr
                ffi[sl:sl + nG, j] = fi
            frb = fr[:, None, :]
            fib = fi[:, None, :]
            Wre[j] = Wre[j] - (frb * prw_re - fib * prw_im)
            Wim[j] = Wim[j] - (frb * prw_im + fib * prw_re)
            if upd_b:
                Bre[j] = Bre[j] - (frb * prb_re - fib * prb_im)
                Bim[j] = Bim[j] - (frb * prb_im + fib * prb_re)
            used[j] = used[j] + ohs[j]
        if k == 0:
            ohs_first = ohs

    # Compaction: survivors in ascending original (slot) order.
    outsW: List = []
    outsB: List = []
    if g - l == 1:
        live = [1.0 - used[j] for j in range(g)]
        ore = live[0][:, None, :] * Wre[0]
        oim = live[0][:, None, :] * Wim[0]
        for j in range(1, g):
            ore = ore + live[j][:, None, :] * Wre[j]
            oim = oim + live[j][:, None, :] * Wim[j]
        outsW.append((ore, oim))
        if need_b_out:
            bre = live[0][:, None, :] * Bre[0]
            bim = live[0][:, None, :] * Bim[0]
            for j in range(1, g):
                bre = bre + live[j][:, None, :] * Bre[j]
                bim = bim + live[j][:, None, :] * Bim[j]
            outsB.append((bre, bim))
    else:  # (g, l) == (3, 1): two survivors, sorted order
        oh0, oh1, oh2 = ohs_first
        w01 = (oh1 + oh2)[:, None, :]
        w02 = oh0[:, None, :]
        w11 = oh2[:, None, :]
        w12 = (oh0 + oh1)[:, None, :]
        outsW.append((w01 * Wre[0] + w02 * Wre[1],
                      w01 * Wim[0] + w02 * Wim[1]))
        outsW.append((w11 * Wre[1] + w12 * Wre[2],
                      w11 * Wim[1] + w12 * Wim[2]))
        if need_b_out:
            outsB.append((w01 * Bre[0] + w02 * Bre[1],
                          w01 * Bim[0] + w02 * Bim[1]))
            outsB.append((w11 * Bre[1] + w12 * Bre[2],
                          w11 * Bim[1] + w12 * Bim[2]))

    if fam.out_runs is not None:
        for s, runs in enumerate(fam.out_runs):
            ore, oim = outsW[s]
            for dst_lo, dst_hi, src_lo in runs:
                cnt = dst_hi - dst_lo
                m[dst_lo:dst_hi, co:width] = jnp.concatenate(
                    [ore[src_lo:src_lo + cnt], oim[src_lo:src_lo + cnt]],
                    axis=2,
                )
        return None
    return (outsW, outsB, fam.blk)


def _reduce_forward(c: FusedConstants, m, sv_re, sv_im, used, T: int,
                    save=None):
    """Condensed forward elimination: family stages, then the reduced
    system (m rows [0:n2] at columns [col_off:width]).

    save = (foh, ffr, ffi): record pivot one-hots + multipliers so
    _reduce_resolve_rhs can replay the factorization on a new rhs
    (family steps at rows [0:col_off) / second index j; reduced stages
    at rows [col_off + s])."""
    red = c.reduced
    co = red.col_off
    n = len(c.perm)
    width = n + 2
    prev_outs: List = []
    for fam in red.fams:
        prev_outs.append(_fam_forward(c, fam, m, sv_re, sv_im, T,
                                      prev_outs, save=save))

    # Reduced-system elimination: same machinery as _eliminate, shifted
    # into the tail column window with save slots at col_off + s.
    used[0:red.n2] = jnp.zeros((red.n2, T), jnp.float32)
    for group, runs, lo in red.red_plan:
        nc = sum(hi - lo_r for lo_r, hi in runs)
        all_fresh = group[0][3]
        if len(runs) == 1:
            r0, r1 = runs[0]
            Mw = m[r0:r1, co + lo:width]
            ure = (jnp.zeros((nc, T), jnp.float32) if all_fresh
                   else used[r0:r1])
        else:
            Mw = jnp.concatenate(
                [m[a:b, co + lo:width] for a, b in runs], axis=0
            )
            ure = (jnp.zeros((nc, T), jnp.float32) if all_fresh
                   else jnp.concatenate([used[a:b] for a, b in runs],
                                        axis=0))
        Mre = Mw[:, :, :T]
        Mim = Mw[:, :, T:]
        for s, _, _, fresh, last in group:
            jcol = s - lo
            cr = Mre[:, jcol, :]
            ci = Mim[:, jcol, :]
            metric = jnp.abs(cr) + jnp.abs(ci)
            if not fresh:
                metric = jnp.where(ure > 0.5, -1.0, metric)
            mx = jnp.max(metric, axis=0, keepdims=True)
            hit = metric >= mx
            rid = jax.lax.broadcasted_iota(jnp.int32, (nc, T), 0)
            first = jnp.min(jnp.where(hit, rid, nc), axis=0, keepdims=True)
            oh = (rid == first).astype(jnp.float32)
            prow_re = jnp.sum(oh[:, None, :] * Mre, axis=0)
            prow_im = jnp.sum(oh[:, None, :] * Mim, axis=0)
            sv_re[co + s, co + lo:width] = prow_re
            sv_im[co + s, co + lo:width] = prow_im
            pr = prow_re[jcol:jcol + 1]
            pi = prow_im[jcol:jcol + 1]
            den = pr * pr + pi * pi
            den = jnp.where(den == 0.0, 1.0, den)
            fr, fi = _cmul(cr, ci, pr / den, -pi / den)
            nm = 1.0 - oh
            fr = fr * nm
            fi = fi * nm
            if save is not None:
                foh, ffr, ffi = save
                foh[co + s, :nc] = oh
                ffr[co + s, :nc] = fr
                ffi[co + s, :nc] = fi
            Mre = Mre - (fr[:, None, :] * prow_re[None]
                         - fi[:, None, :] * prow_im[None])
            Mim = Mim - (fr[:, None, :] * prow_im[None]
                         + fi[:, None, :] * prow_re[None])
            ure = ure + oh
        last_any = group[-1][4]
        new_w = jnp.concatenate([Mre, Mim], axis=2)
        off = 0
        for a, b in runs:
            w_r = b - a
            m[a:b, co + lo:width] = new_w[off:off + w_r]
            if not last_any:
                used[a:b] = ure[off:off + w_r]
            off += w_r


def _reduce_backsub(c: FusedConstants, sv_re, sv_im, xe_re, xe_im, T: int):
    """Condensed back-substitution: reduced system in reverse, then
    batched family recoveries (reverse family / reverse step order)."""
    red = c.reduced
    co = red.col_off
    n = len(c.perm)
    width = n + 2
    xe_re[:] = jnp.zeros((width, T), jnp.float32)
    xe_im[:] = jnp.zeros((width, T), jnp.float32)
    xe_re[n:n + 1] = -jnp.ones((1, T), jnp.float32)
    for s in range(red.n2 - 1, -1, -1):
        lo = co + red.red_steps[s][2]
        prow_re = sv_re[co + s, lo:width]
        prow_im = sv_im[co + s, lo:width]
        tail_re = xe_re[lo:width]
        tail_im = xe_im[lo:width]
        ar, ai = _cmul(prow_re, prow_im, tail_re, tail_im)
        acc_re = jnp.sum(ar, axis=0, keepdims=True)
        acc_im = jnp.sum(ai, axis=0, keepdims=True)
        pr = prow_re[co + s - lo:co + s - lo + 1]
        pi = prow_im[co + s - lo:co + s - lo + 1]
        den = pr * pr + pi * pi
        den = jnp.where(den == 0.0, 1.0, den)
        xr, xi = _cmul(acc_re, acc_im, -pr / den, pi / den)
        xe_re[co + s:co + s + 1] = xr
        xe_im[co + s:co + s + 1] = xi
    # Family recoveries: each is the standard saved-pivot-row step, nG
    # groups at once.  Order matters: consumers' columns (filled first)
    # appear in producers' saved rows; a family's own earlier-step columns
    # hold elimination dust times a still-zero xe entry (exact zero).
    for fam in reversed(list(red.fams)):
        nG = fam.nG
        blo, bhi = fam.blk
        for k in range(fam.l - 1, -1, -1):
            sl = fam.base + k * nG
            swr = sv_re[sl:sl + nG, co:width]
            swi = sv_im[sl:sl + nG, co:width]
            txr = xe_re[co:width]
            txi = xe_im[co:width]
            acc_re = jnp.sum(swr * txr - swi * txi, axis=1)
            acc_im = jnp.sum(swr * txi + swi * txr, axis=1)
            sbr = sv_re[sl:sl + nG, blo:bhi]
            sbi = sv_im[sl:sl + nG, blo:bhi]
            if fam.blk_extra or fam.l > 1:
                bxr = xe_re[blo:bhi]
                bxi = xe_im[blo:bhi]
                acc_re = acc_re + jnp.sum(sbr * bxr - sbi * bxi, axis=1)
                acc_im = acc_im + jnp.sum(sbr * bxi + sbi * bxr, axis=1)
            gi = jax.lax.broadcasted_iota(jnp.int32, (nG, bhi - blo, 1), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (nG, bhi - blo, 1), 1)
            sel = (ci == gi + (fam.base + k * nG - blo)).astype(jnp.float32)
            pr = jnp.sum(sbr * sel, axis=1)
            pi = jnp.sum(sbi * sel, axis=1)
            den = pr * pr + pi * pi
            den = jnp.where(den == 0.0, 1.0, den)
            xr, xi = _cmul(acc_re, acc_im, -pr / den, pi / den)
            xe_re[sl:sl + nG] = xr
            xe_im[sl:sl + nG] = xi
    return xe_re[:n], xe_im[:n]


def _resolve_rhs(c: FusedConstants, sv_re, sv_im, foh, ffr, ffi,
                 rr_re, rr_im, xe_re, xe_im, rhs, T: int,
                 backsub: bool = True):
    """Re-apply a saved factorization to a new rhs, then back-substitute.

    Forward pass: replay each step's pivot one-hot + multipliers on the rhs
    vector only; the eliminated pivot-row rhs overwrites the saved row's
    rhs column so the shared _backsub solves against the new rhs.  This is
    the frozen-Jacobian RK path: O(n^2)-ish instead of a full elimination.
    """
    n = len(c.perm)
    rr_re[:] = rhs[:, :T]
    rr_im[:] = rhs[:, T:]
    for s, runs, lo in c.steps:
        nc = sum(hi - lo_r for lo_r, hi in runs)
        if len(runs) == 1:
            a0, b0 = runs[0]
            Rre = rr_re[a0:b0]
            Rim = rr_im[a0:b0]
        else:
            Rre = jnp.concatenate([rr_re[a:b] for a, b in runs], axis=0)
            Rim = jnp.concatenate([rr_im[a:b] for a, b in runs], axis=0)
        oh = foh[s, :nc]
        pr = jnp.sum(oh * Rre, axis=0, keepdims=True)   # (1, T)
        pi = jnp.sum(oh * Rim, axis=0, keepdims=True)
        fr = ffr[s, :nc]
        fi = ffi[s, :nc]
        new_re = Rre - (fr * pr - fi * pi)
        new_im = Rim - (fr * pi + fi * pr)
        off = 0
        for a, b in runs:
            w_r = b - a
            rr_re[a:b] = new_re[off:off + w_r]
            rr_im[a:b] = new_im[off:off + w_r]
            off += w_r
        sv_re[s, n:n + 1] = pr
        sv_im[s, n:n + 1] = pi
    # backsub=False leaves sv backsub-ready without solving (the CPH
    # stage-1 branch calls the shared backsub outside its pl.when).
    if not backsub:
        return None
    return _backsub(c, sv_re, sv_im, xe_re, xe_im, T)


def _reduce_resolve_rhs(c: FusedConstants, sv_re, sv_im, foh, ffr, ffi,
                        rr_re, rr_im, xe_re, xe_im, rhs, T: int,
                        backsub: bool = True):
    """Re-apply a saved CONDENSED factorization to a new rhs + backsub.

    Mirrors _reduce_forward's read/write sequence on the rhs vector
    alone: family steps replay their saved per-row-tensor one-hots and
    multipliers, survivors' rhs compact exactly like the matrix rows
    (same combos as _fam_forward), then the reduced stages replay like
    _resolve_rhs shifted to save rows [col_off + s].  Each pivot's new
    rhs overwrites the saved row's rhs column so the shared
    _reduce_backsub solves against it (column n enters backsub through
    xe[n] = -1; the pad column's xe stays zero).
    """
    red = c.reduced
    co = red.col_off
    n = len(c.perm)
    rr_re[:] = rhs[:, :T]
    rr_im[:] = rhs[:, T:]
    prev_r: List = []
    for fam in red.fams:
        nG, g, l = fam.nG, fam.g, fam.l
        Rre: List = [None] * g
        Rim: List = [None] * g
        for j in range(g):
            if fam.src_row_lo >= 0:
                r0 = fam.src_row_lo + j * nG
                Rre[j] = rr_re[r0:r0 + nG]
                Rim[j] = rr_im[r0:r0 + nG]
            else:
                pR = prev_r[fam.src_fam]
                pnG = pR[0][0].shape[0]
                si, off = divmod(fam.src_slot_lo[j], pnG)
                Rre[j] = pR[si][0][off:off + nG]
                Rim[j] = pR[si][1][off:off + nG]
        used = [jnp.zeros((nG, T), jnp.float32) for _ in range(g)]
        ohs_first: List = []
        for k in range(l):
            sl = fam.base + k * nG
            ohs = [foh[sl:sl + nG, j] for j in range(g)]
            pr = ohs[0] * Rre[0]
            pi = ohs[0] * Rim[0]
            for j in range(1, g):
                pr = pr + ohs[j] * Rre[j]
                pi = pi + ohs[j] * Rim[j]
            sv_re[sl:sl + nG, n:n + 1] = jnp.expand_dims(pr, 1)
            sv_im[sl:sl + nG, n:n + 1] = jnp.expand_dims(pi, 1)
            for j in range(g):
                fr = ffr[sl:sl + nG, j]
                fi = ffi[sl:sl + nG, j]
                Rre[j] = Rre[j] - (fr * pr - fi * pi)
                Rim[j] = Rim[j] - (fr * pi + fi * pr)
                used[j] = used[j] + ohs[j]
            if k == 0:
                ohs_first = ohs

        outs: List = []
        if g - l == 1:
            live = [1.0 - used[j] for j in range(g)]
            ore = live[0] * Rre[0]
            oim = live[0] * Rim[0]
            for j in range(1, g):
                ore = ore + live[j] * Rre[j]
                oim = oim + live[j] * Rim[j]
            outs.append((ore, oim))
        else:  # (g, l) == (3, 1): two survivors, sorted order
            oh0, oh1, oh2 = ohs_first
            w01 = oh1 + oh2
            w02 = oh0
            w11 = oh2
            w12 = oh0 + oh1
            outs.append((w01 * Rre[0] + w02 * Rre[1],
                         w01 * Rim[0] + w02 * Rim[1]))
            outs.append((w11 * Rre[1] + w12 * Rre[2],
                         w11 * Rim[1] + w12 * Rim[2]))

        if fam.out_runs is not None:
            for s_i, runs in enumerate(fam.out_runs):
                ore, oim = outs[s_i]
                for dst_lo, dst_hi, src_lo in runs:
                    cnt = dst_hi - dst_lo
                    rr_re[dst_lo:dst_hi] = ore[src_lo:src_lo + cnt]
                    rr_im[dst_lo:dst_hi] = oim[src_lo:src_lo + cnt]
            prev_r.append(None)
        else:
            prev_r.append(outs)

    for s, runs, lo in red.red_steps:
        nc = sum(hi - lo_r for lo_r, hi in runs)
        if len(runs) == 1:
            a0, b0 = runs[0]
            Rre2 = rr_re[a0:b0]
            Rim2 = rr_im[a0:b0]
        else:
            Rre2 = jnp.concatenate([rr_re[a:b] for a, b in runs], axis=0)
            Rim2 = jnp.concatenate([rr_im[a:b] for a, b in runs], axis=0)
        oh = foh[co + s, :nc]
        pr = jnp.sum(oh * Rre2, axis=0, keepdims=True)
        pi = jnp.sum(oh * Rim2, axis=0, keepdims=True)
        fr = ffr[co + s, :nc]
        fi = ffi[co + s, :nc]
        new_re = Rre2 - (fr * pr - fi * pi)
        new_im = Rim2 - (fr * pi + fi * pr)
        off = 0
        for a, b in runs:
            w_r = b - a
            rr_re[a:b] = new_re[off:off + w_r]
            rr_im[a:b] = new_im[off:off + w_r]
            off += w_r
        sv_re[co + s, n:n + 1] = pr
        sv_im[co + s, n:n + 1] = pi
    if not backsub:
        return None
    return _reduce_backsub(c, sv_re, sv_im, xe_re, xe_im, T)


# ---------------------------------------------------------------------------
# The kernel.
# ---------------------------------------------------------------------------

# flags rows: t, dt, succ_count, end_zone, check_depths, inf_fail, pruned,
# num_steps (all f32; bools are 0/1).
_F_T, _F_DT, _F_SC, _F_EZ, _F_CK, _F_INF, _F_PRN, _F_NST = range(8)


def _make_kernel(c: FusedConstants, cfg: HCConfig, T: int, n_iters: int,
                 interpret: bool = False):
    """Kernel running up to n_iters HC steps on resumable state.

    State (x, x_last, flags) comes in as inputs and leaves as outputs, so
    the same kernel serves both the single-shot tracker (n_iters covers the
    whole budget) and the segmented tracker (ops/segmented.py) that scores
    candidates / compacts survivors between segments.
    """
    n = len(c.perm)

    merged = cfg.eval_structure == "merged"
    gathered = cfg.eval_structure == "gathered"
    nconst = 5 if merged else (6 if gathered else 7)
    eval_fn = (_eval_core_merged if merged
               else _eval_core_gathered if gathered else _eval_core)

    def kernel(niter, x0_re, x0_im, xli_re, xli_im, fli,
               apr, api, bpr, bpi, cpr, cpi, *rest):
        cr = rest[:nconst]
        (xo_re, xo_im, xl_re, xl_im, flags,
         m_sc, sv_re, sv_im, used, xe_re, xe_im,
         agq, prk, pco, cw_re, cw_im, cfl,
         *rkj_and_cont) = rest[nconst:]
        if (cfg.rk_jacobian_reuse or cfg.corrector_jacobian_reuse
                or cfg.predictor_handoff):
            foh, ffr, ffi, rr_re, rr_im, cont = rkj_and_cont
        else:
            (cont,) = rkj_and_cont
            foh = ffr = ffi = rr_re = rr_im = None
        if cfg.predictor_handoff and cfg.rk_jacobian_reuse:
            raise ValueError(
                "predictor_handoff and rk_jacobian_reuse share the saved-"
                "factorization slots; enable at most one")
        if merged:
            ohx23, ohq23, ohg, fold_h, fold_t = cr
            consts_f = (ohx23[:], ohg[:], fold_h[:], fold_t[:])
        elif gathered:
            ohx23, ohq23, ohg, chx, cht, chtneg = cr
            consts_f = (ohx23[:], ohg[:], chx[:], cht[:], chtneg[:])
        else:
            ohx23, ohx2g, ohx3g, ohq23, chx, cht, chtneg = cr
            consts_f = (ohx23[:], ohx2g[:], ohx3g[:], chx[:], cht[:],
                        chtneg[:])
        # Matmul modes: interpret mode keeps plain f32 for exact oracle
        # parity; on TPU "split3" runs every constant matmul as 1-pass
        # bf16 products of the exact f32 split (see _split3).  On the
        # merged structure the two GATHER matmuls use the K-concatenated
        # split (_kdot: one matmul, adds folded into MXU accumulation);
        # the fold keeps the 3-dot form (tripling its 624-row input
        # would cost more than the adds it saves).
        split = (not interpret) and cfg.eval_precision.startswith("split3")
        rk2 = split and cfg.eval_precision == "split3_rk2"
        kconcat = split and cfg.eval_precision == "split3k"
        if split:
            consts_b = tuple(a.astype(jnp.bfloat16) for a in consts_f)
            if merged:
                consts = (
                    jnp.concatenate([consts_b[0]] * 3, axis=1),
                    jnp.concatenate([consts_b[1]] * 3, axis=1),
                    consts_b[2], consts_b[3],
                )
                dots = dict(dot_g=_kdot, dot_f=_sdot)
                dots_rk = (dict(dot_g=_kdot2, dot_f=_sdot2)
                           if rk2 else dots)
            elif kconcat:
                # "split3k": every constant matmul as ONE K-concatenated
                # split product (5 matmul issues per evaluation instead
                # of 15 -- the per-call overhead dominates at these
                # shapes, ~0.23 us/call measured).  Same exact 3-term
                # split; only the h+l1+l2 add association moves into the
                # MXU K-accumulation (~1 ulp class, conv-gated like any
                # eval-precision change).
                consts = tuple(jnp.concatenate([cb] * 3, axis=1)
                               for cb in consts_b)
                dots = dots_rk = dict(dot=_kdot)
            else:
                # classic AND gathered: per-matmul 3-term splits, added in
                # a fixed order -- the two structures stay bit-identical.
                consts = consts_b
                dots = dict(dot=_sdot)
                # RK-stage matmul precision: a 1-pass bf16 predictor was
                # measured useless (zero wall-clock gain, convergence
                # 2460 -> 1335 per 31200 paths); by default RK stages
                # keep the corrector's exact 3-term splits.
                # "split3_rk2" runs the PREDICTOR at 2-term splits (~16
                # significant bits; the corrector stays exact) -- gate
                # any adoption on convergence statistics.
                dots_rk = dict(dot=_sdot2) if rk2 else dots
        else:
            consts = consts_f
            dots = dots_rk = (dict(dot_g=_dot, dot_f=_dot) if merged
                              else dict(dot=_dot))

        # Hoisted pair-product quadratic coefficients, gathered to combos
        # once per tile in wide [re | im] lane layout (the L2-persistent
        # index-table analogue, GPU_HC_Solver.cpp:99-122 -- here they
        # simply live in VMEM for the whole tile lifetime).
        for i, (re_src, im_src) in enumerate(
            ((apr, api), (bpr, bpi), (cpr, cpi))
        ):
            wide = jnp.concatenate([re_src[:], im_src[:]], axis=1)
            agq[i] = _dot(ohq23[:], wide)

        xo_re[:] = x0_re[:]
        xo_im[:] = x0_im[:]
        xl_re[:] = xli_re[:]
        xl_im[:] = xli_im[:]
        fl0 = fli[:]
        flags[:] = fl0
        t0 = fl0[_F_T:_F_T + 1]
        conv0 = jnp.maximum(
            (t0 >= 1.0).astype(jnp.float32),
            (1.0 - t0 <= cfg.t_converged_eps).astype(jnp.float32),
        )
        act0 = (
            (1.0 - conv0)
            * (1.0 - fl0[_F_INF:_F_INF + 1])
            * (1.0 - fl0[_F_PRN:_F_PRN + 1])
        )
        cont[0] = jnp.max(act0).astype(jnp.int32)
        if cfg.predictor_handoff:
            # No saved factorization exists at (re)launch: scratch does not
            # persist across segment launches, so the first step of every
            # segment runs the full stage-1 eval + elimination.
            cont[1] = 0

        def one_step():
            ones = jnp.ones((1, T), jnp.float32)
            zeros = jnp.zeros((1, T), jnp.float32)

            def tw(tt):
                return jnp.concatenate([tt, tt], axis=1)

            def _wide(x):
                return jnp.concatenate(
                    [
                        jnp.concatenate([x[0], ones], axis=0),
                        jnp.concatenate([x[1], zeros], axis=0),
                    ],
                    axis=1,
                )

            def es(x, P, want_h, rk=False, save=None):
                hx, rhs = eval_fn(
                    c, consts, P[:], _wide(x), T, want_h,
                    **(dots_rk if rk else dots)
                )
                _assemble(c, m_sc, hx, rhs, T)
                return _solve(
                    c, m_sc, sv_re, sv_im, used, xe_re, xe_im, T, save=save
                )

            replay_fn = (_reduce_resolve_rhs if c.reduced is not None
                         else _resolve_rhs)

            def es_rhs(x):
                # Frozen-Jacobian stage: -Ht only, replay the saved
                # factorization on the new rhs (strategy RKJ; see HCConfig).
                _, rhs = eval_fn(
                    c, consts, prk[:], _wide(x), T, False,
                    need_hx=False, **dots_rk
                )
                return replay_fn(
                    c, sv_re, sv_im, foh, ffr, ffi, rr_re, rr_im,
                    xe_re, xe_im, rhs, T
                )

            x_re = xo_re[:]
            x_im = xo_im[:]
            t = flags[_F_T:_F_T + 1]
            dt = flags[_F_DT:_F_DT + 1]
            succ = flags[_F_SC:_F_SC + 1]
            ez = flags[_F_EZ:_F_EZ + 1]
            chk = flags[_F_CK:_F_CK + 1]
            inf = flags[_F_INF:_F_INF + 1]
            prn = flags[_F_PRN:_F_PRN + 1]
            nst = flags[_F_NST:_F_NST + 1]

            # All per-path predicates are carried as f32 0/1 masks: Mosaic
            # cannot round-trip i1 vectors through selects (i8 trunc error),
            # so boolean algebra becomes min/max/multiply arithmetic.
            convf = jnp.maximum(
                (t >= 1.0).astype(jnp.float32),
                (1.0 - t <= cfg.t_converged_eps).astype(jnp.float32),
            )
            activef = (1.0 - convf) * (1.0 - inf) * (1.0 - prn)

            ez = jnp.maximum(
                ez,
                (jnp.abs(1.0 - t) <= cfg.end_zone_factor).astype(jnp.float32),
            )
            if cfg.truncate_paths:
                drows = jnp.concatenate(
                    [xo_re[r:r + 1] for r in c.depth_rows], axis=0
                )
                depths_bad = (
                    jnp.min(drows, axis=0, keepdims=True) <= 0.0
                ).astype(jnp.float32)
                watch = chk * (t > 0.0).astype(jnp.float32)
                chk = watch * depths_bad + (1.0 - watch) * chk
                prn = jnp.maximum(
                    prn,
                    activef * (t > 0.95).astype(jnp.float32) * chk,
                )
                activef = activef * (1.0 - prn)

            dtc = jnp.where(
                ez > 0.5,
                jnp.minimum(dt, jnp.abs(1.0 - t)),
                jnp.minimum(dt, jnp.abs(0.95 - t)),
            )
            half = 0.5 * dtc

            # RK4 predictor (...TrunPaths.cu:170-211): the cached parameter
            # products refill once per distinct t (t, t+h/2, t+h).  With
            # rk_jacobian_reuse, stages 2-4 freeze Hx at the step's start
            # and only re-evaluate Ht + replay the factorization.
            tb = t + half
            tc = tb + half
            _fill_P(c, prk, agq, tw(t), rk=True,
                    basis=cfg.pair_coef_basis)
            if cfg.rk_jacobian_reuse:
                k1 = es((x_re, x_im), prk, False, rk=True,
                        save=(foh, ffr, ffi))
                stage = lambda x: es_rhs(x)
            elif cfg.predictor_handoff:
                # (CPH, HCConfig.predictor_handoff) stage 1: when the
                # previous step advanced every lane (cont[1], set below),
                # evaluate only -Ht and replay the corrector's saved
                # factorization; otherwise the full eval + elimination.
                # Both branches leave sv backsub-ready; the shared
                # backsub runs outside the predicated regions.
                @pl.when(cont[1] == 1)
                def _():
                    _, rhs = eval_fn(
                        c, consts, prk[:], _wide((x_re, x_im)), T, False,
                        need_hx=False, **dots_rk
                    )
                    replay_fn(
                        c, sv_re, sv_im, foh, ffr, ffi, rr_re, rr_im,
                        xe_re, xe_im, rhs, T, backsub=False
                    )

                @pl.when(cont[1] == 0)
                def _():
                    hx, rhs = eval_fn(
                        c, consts, prk[:], _wide((x_re, x_im)), T, False,
                        **dots_rk
                    )
                    _assemble(c, m_sc, hx, rhs, T)
                    if c.reduced is not None:
                        _reduce_forward(c, m_sc, sv_re, sv_im, used, T)
                    else:
                        _eliminate(c, m_sc, sv_re, sv_im, used, T)

                k1 = (_reduce_backsub if c.reduced is not None
                      else _backsub)(c, sv_re, sv_im, xe_re, xe_im, T)
                stage = lambda x: es(x, prk, False, rk=True)
            else:
                k1 = es((x_re, x_im), prk, False, rk=True)
                stage = lambda x: es(x, prk, False, rk=True)
            xb = (x_re + half * k1[0], x_im + half * k1[1])
            _fill_P(c, prk, agq, tw(tb), rk=True,
                    basis=cfg.pair_coef_basis)
            k2 = stage(xb)
            if cfg.predictor == "rk2":
                # Midpoint predictor (HCConfig.predictor): 2 stages.
                cur_re = x_re + dtc * k2[0]
                cur_im = x_im + dtc * k2[1]
            elif cfg.predictor == "rk3":
                # Kutta's third-order rule: 3 stages.
                xe3 = (x_re - dtc * k1[0] + 2.0 * dtc * k2[0],
                       x_im - dtc * k1[1] + 2.0 * dtc * k2[1])
                _fill_P(c, prk, agq, tw(tc), rk=True,
                        basis=cfg.pair_coef_basis)
                k3 = stage(xe3)
                sixth = dtc / 6.0
                cur_re = x_re + sixth * (k1[0] + 4.0 * k2[0] + k3[0])
                cur_im = x_im + sixth * (k1[1] + 4.0 * k2[1] + k3[1])
            else:
                xc = (x_re + half * k2[0], x_im + half * k2[1])
                k3 = stage(xc)
                xd = (x_re + dtc * k3[0], x_im + dtc * k3[1])
                _fill_P(c, prk, agq, tw(tc), rk=True,
                        basis=cfg.pair_coef_basis)
                k4 = stage(xd)
                sixth = dtc / 6.0
                cur_re = x_re + sixth * (
                    k1[0] + 2.0 * (k2[0] + k3[0]) + k4[0])
                cur_im = x_im + sixth * (
                    k1[1] + 2.0 * (k2[1] + k3[1]) + k4[1])

            # Newton corrector at frozen t_c (:216-250): state lives in
            # scratch refs so iterations after the first run under a
            # tile-wide skip once every lane has succeeded or blown up
            # (the reference's per-warp corrector break, :241-242).  The
            # corrector's parameter products are filled once: t is frozen
            # (the reference reuses s_param_homotopy the same way).
            _fill_P(c, pco, agq, tw(tc), rk=False,
                    basis=cfg.pair_coef_basis)
            cw_re[:] = cur_re
            cw_im[:] = cur_im
            cfl[:] = jnp.zeros((3, T), jnp.float32)

            cjr = cfg.corrector_jacobian_reuse

            def corrector_iter(it=0):
                donef_l = cfl[2:3]
                if cjr and it >= cjr:
                    # Modified Newton (strategy CJR, see HCConfig): the
                    # factorization saved on the last full iteration
                    # replays on the fresh H rhs -- no Hx gather, no
                    # assembly, no forward elimination.
                    _, rhs = eval_fn(
                        c, consts, pco[:], _wide((cw_re[:], cw_im[:])), T,
                        True, need_hx=False, **dots
                    )
                    dx = replay_fn(
                        c, sv_re, sv_im, foh, ffr, ffi, rr_re, rr_im,
                        xe_re, xe_im, rhs, T
                    )
                else:
                    dx = es(
                        (cw_re[:], cw_im[:]), pco, True,
                        save=((foh, ffr, ffi)
                              if (cjr or cfg.predictor_handoff) else None),
                    )
                live = 1.0 - donef_l
                nr = cw_re[:] - live * dx[0]
                ni = cw_im[:] - live * dx[1]
                sq_dx = jnp.sum(dx[0] ** 2 + dx[1] ** 2, axis=0,
                                keepdims=True)
                sq_x = jnp.sum(nr ** 2 + ni ** 2, axis=0, keepdims=True)
                succ_i = (sq_dx < cfg.corrector_tol_sq * sq_x).astype(
                    jnp.float32
                )
                inf_i = (sq_x > cfg.infinity_norm_sq).astype(jnp.float32)
                sf = cfl[0:1] * donef_l + live * succ_i
                inf_f = cfl[1:2] * donef_l + live * inf_i
                df = jnp.maximum(donef_l, jnp.maximum(sf, inf_f))
                cw_re[:] = nr
                cw_im[:] = ni
                cfl[:] = jnp.concatenate([sf, inf_f, df], axis=0)

            corrector_iter(0)
            for _it in range(1, cfg.max_correction_steps):
                @pl.when(jnp.min(cfl[2:3]) < 0.5)
                def _(_it=_it):
                    corrector_iter(_it)
            successf = cfl[0:1]
            inff = cfl[1:2]
            cur_re = cw_re[:]
            cur_im = cw_im[:]

            # Outcome bookkeeping (:252-276), as in ops/tracker.py.
            inf_hitf = activef * inff
            okf = activef * (1.0 - inff)
            failf = okf * (1.0 - successf)
            goodf = okf * successf
            takec = jnp.maximum(goodf, inf_hitf)

            if cfg.predictor_handoff:
                # Handoff validity for the NEXT step: no lane rolled back
                # (failed lanes revert x and t, invalidating the saved
                # factorization; infinity lanes go inactive and don't
                # block).  Tile-granular by construction.
                cont[1] = (jnp.max(failf) < 0.5).astype(jnp.int32)

            old_re = xo_re[:]
            old_im = xo_im[:]
            last_re = xl_re[:]
            last_im = xl_im[:]
            new_re = takec * cur_re + (1.0 - takec) * (
                failf * last_re + (1.0 - failf) * old_re
            )
            new_im = takec * cur_im + (1.0 - takec) * (
                failf * last_im + (1.0 - failf) * old_im
            )
            xo_re[:] = new_re
            xo_im[:] = new_im
            xl_re[:] = goodf * cur_re + (1.0 - goodf) * last_re
            xl_im[:] = goodf * cur_im + (1.0 - goodf) * last_im

            advancef = jnp.maximum(goodf, inf_hitf)
            new_t = advancef * tc + (1.0 - advancef) * t
            succ2 = goodf * (succ + 1.0) + (1.0 - goodf) * (1.0 - failf) * succ
            bump = goodf * (
                succ2 >= cfg.steps_to_increase_delta_t
            ).astype(jnp.float32)
            new_dt = (
                failf * (dtc * 0.5)
                + bump * (dtc * 2.0)
                + (1.0 - failf) * (1.0 - bump) * dtc
            )
            new_dt = activef * new_dt + (1.0 - activef) * dt
            succ2 = (1.0 - bump) * succ2
            succ2 = activef * succ2 + (1.0 - activef) * succ
            inf2 = jnp.maximum(inf, inf_hitf)
            nst2 = nst + activef

            flags[:] = jnp.concatenate(
                [new_t, new_dt, succ2, ez, chk, inf2, prn, nst2], axis=0
            )

            # Tile early exit: stop when every lane is converged / failed.
            conv2 = jnp.maximum(
                (new_t >= 1.0).astype(jnp.float32),
                (1.0 - new_t <= cfg.t_converged_eps).astype(jnp.float32),
            )
            active2 = (1.0 - conv2) * (1.0 - inf2) * (1.0 - prn)
            cont[0] = jnp.max(active2).astype(jnp.int32)

        def body(i, carry):
            @pl.when((cont[0] == 1) & (i < niter[0]))
            def _():
                one_step()
            return carry

        jax.lax.fori_loop(0, n_iters, body, 0)

    return kernel


# ---------------------------------------------------------------------------
# Host-facing factory.
# ---------------------------------------------------------------------------


def build_kernel_caller(
    c: FusedConstants,
    problem: TrifocalProblem,
    cfg: HCConfig,
    tile: int,
    n_iters: int,
    interpret: bool,
):
    """Return run(state, coefs) -> state executing n_iters HC steps.

    state = (x_re, x_im, xl_re, xl_im, flags) batch-last (rows, Bp) with Bp
    a multiple of ``tile``; coefs = 6 arrays (Q, Bp).  Grid iterates path
    tiles; a tile with no active lane skips its whole segment.
    """
    if not interpret and tile % 128 != 0:
        # Mosaic requires lane-dim block sizes divisible by 128 (or equal
        # to the whole array): paths ride the lane axis, so sub-128 tiles
        # are structurally unsupported on TPU -- and would waste vector
        # lanes even if they lowered (a 64-path tile computes on
        # half-empty vregs).  Measured: campaign 19 probe, deterministic
        # Mosaic lowering ValueError at TPUHC_TILE=64.  Interpret-mode
        # tests/dryruns use small tiles freely.
        raise ValueError(
            f"HCConfig.tile={tile} is not a multiple of 128: the fused "
            "TPU kernel tiles paths along the 128-wide lane axis "
            "(Pallas/Mosaic block-shape requirement). Use 128/256/..., "
            "or interpret mode for small-tile testing."
        )
    kernel = _make_kernel(c, cfg, tile, n_iters, interpret=interpret)
    n = problem.num_vars
    width = n + 2
    q = c.q
    kp = c.kp
    if cfg.eval_structure == "merged":
        const_arrs = (c.ohx23, c.ohq23, c.ohg, c.fold_h, c.fold_t)
    elif cfg.eval_structure == "gathered":
        const_arrs = (c.ohx23, c.ohq23, c.ohg, c.chx, c.cht, c.chtneg)
    else:
        const_arrs = (c.ohx23, c.ohx2g, c.ohx3g, c.ohq23, c.chx, c.cht,
                      c.chtneg)
    grid_consts = [jnp.asarray(a) for a in const_arrs]

    def _const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def _tile_spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def run(state, coefs, niter=None):
        if niter is None:
            niter = jnp.full((1,), n_iters, jnp.int32)
        x_re, x_im, xl_re, xl_im, fl = state
        Bp = x_re.shape[1]
        nt = Bp // tile
        out_shapes = (
            jax.ShapeDtypeStruct((n, Bp), jnp.float32),
            jax.ShapeDtypeStruct((n, Bp), jnp.float32),
            jax.ShapeDtypeStruct((n, Bp), jnp.float32),
            jax.ShapeDtypeStruct((n, Bp), jnp.float32),
            jax.ShapeDtypeStruct((8, Bp), jnp.float32),
        )
        scratch = [
            pltpu.VMEM((n, width, 2 * tile), jnp.float32),  # m (wide planes)
            pltpu.VMEM((n, width, tile), jnp.float32),  # sv_re
            pltpu.VMEM((n, width, tile), jnp.float32),  # sv_im
            pltpu.VMEM((n, tile), jnp.float32),         # used
            pltpu.VMEM((width, tile), jnp.float32),     # xe_re (backsub)
            pltpu.VMEM((width, tile), jnp.float32),     # xe_im
            pltpu.VMEM((3, kp, 2 * tile), jnp.float32),  # agq (wide)
            pltpu.VMEM((kp, 2 * tile), jnp.float32),    # prk (RK P cache)
            pltpu.VMEM((kp, 2 * tile), jnp.float32),    # pco (corrector P)
            pltpu.VMEM((n, tile), jnp.float32),         # cw_re (corrector)
            pltpu.VMEM((n, tile), jnp.float32),         # cw_im
            pltpu.VMEM((3, tile), jnp.float32),         # cfl
        ]
        if (cfg.rk_jacobian_reuse or cfg.corrector_jacobian_reuse
                or cfg.predictor_handoff):
            # Saved pivot one-hots + multipliers + rhs-replay workspace for
            # the frozen-Jacobian RK ablation / the modified-Newton
            # corrector / the corrector->predictor handoff
            # (ops/fused._resolve_rhs).
            scratch += [
                pltpu.VMEM((n, n, tile), jnp.float32),
                pltpu.VMEM((n, n, tile), jnp.float32),
                pltpu.VMEM((n, n, tile), jnp.float32),
                pltpu.VMEM((n, tile), jnp.float32),
                pltpu.VMEM((n, tile), jnp.float32),
            ]
        scratch += [pltpu.SMEM((2,), jnp.int32)]  # cont / handoff-valid
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [_tile_spec(n)] * 4
            + [_tile_spec(8)]
            + [_tile_spec(q)] * 6
            + [_const_spec(a) for a in grid_consts]
        )
        out_specs = (
            _tile_spec(n), _tile_spec(n), _tile_spec(n), _tile_spec(n),
            _tile_spec(8),
        )
        return pl.pallas_call(
            kernel,
            grid=(nt,),
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
            input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4},
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                # Tiles are independent (block-partitioned outputs, no
                # cross-tile state), so the grid axis is declared
                # "parallel", letting Mosaic overlap tile prologue/
                # epilogue work across programs (VERDICT r2 item 2's
                # multi-program-in-flight lever).  History: no win on the
                # pre-split3k kernel (campaign 8: step 77.45 vs 75.81
                # us/iter/tile); ADOPTED in round 5 at the split3k
                # defaults by campaign 18c's interleaved bench arms
                # (+GRID over CPH=0: 479.93/478.62 ms vs 479.57/481.03;
                # defaults anchor 486.9) -- per-tile numerics are
                # identical either way, only scheduling changes.
                # TPUHC_GRID_PARALLEL=0 restores the sequential grid.
                dimension_semantics=(
                    ("parallel",)
                    if int(os.environ.get("TPUHC_GRID_PARALLEL", "1"))
                    else None
                ),
            ),
            interpret=interpret,
        )(niter, x_re, x_im, xl_re, xl_im, fl, *coefs, *grid_consts)

    return run


def build_pair_coefs(problem: TrifocalProblem, diff_re, diff_im, Bp: int,
                     tgt_re=None, tgt_im=None, basis: str = "abc",
                     dynamic_start: Optional[bool] = None):
    """Per-path quadratic pair-product coefficients, batch-last.

    basis="abc": p(t) = start + t*diff, so P_q(t) = (s_a + t d_a)
    (s_b + t d_b) = A t^2 + B t + C with A = d_a d_b, B = s_a d_b +
    s_b d_a, C = s_a s_b.  diff_*: (B, P+1) planes; returns 6 arrays
    (Q, Bp).

    basis="efg": the TWO-POINT form P_q(t) = t^2 E + t(1-t) F +
    (1-t)^2 G with E = tgt_a tgt_b, F = tgt_a s_b + s_a tgt_b,
    G = s_a s_b -- exact at both homotopy endpoints, matching the
    oracle's p(t) = t*tgt + (1-t)*start (HCConfig.pair_coef_basis has
    the numerics story).  Requires tgt planes.

    The start system is derived per path as target - diff when
    dynamic_start (monodromy legs track between arbitrary parameter
    points); otherwise the problem's static start parameters are used.
    dynamic_start=None keeps the legacy rule "tgt given => dynamic".
    """
    f = problem.factored
    pp_a = np.asarray(f.pp_a)
    pp_b = np.asarray(f.pp_b)
    q = len(pp_a)
    B = diff_re.shape[0]

    def padb(a):  # (B, K) -> (K, Bp)
        if Bp != B:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (Bp - B,) + a.shape[1:])], axis=0
            )
        return a.T

    if dynamic_start is None:
        dynamic_start = tgt_re is not None
    da_re = padb(diff_re[:, pp_a])
    da_im = padb(diff_im[:, pp_a])
    db_re = padb(diff_re[:, pp_b])
    db_im = padb(diff_im[:, pp_b])
    if not dynamic_start:
        sp = np.asarray(problem.start_params)
        sa_re = sp.real[pp_a][:, None]
        sa_im = sp.imag[pp_a][:, None]
        sb_re = sp.real[pp_b][:, None]
        sb_im = sp.imag[pp_b][:, None]
    else:
        # Start reconstructed as target - diff: exact-data target, the
        # reconstruction rounding lands on the START side (whose roots
        # are known a priori; endpoint accuracy lives at t = 1).
        sa_re = padb(tgt_re[:, pp_a]) - da_re
        sa_im = padb(tgt_im[:, pp_a]) - da_im
        sb_re = padb(tgt_re[:, pp_b]) - db_re
        sb_im = padb(tgt_im[:, pp_b]) - db_im
    if basis == "efg":
        if tgt_re is None:
            raise ValueError("basis='efg' needs target planes (exact "
                             "target data makes E = tgt*tgt exact)")
        ta_re = padb(tgt_re[:, pp_a])
        ta_im = padb(tgt_im[:, pp_a])
        tb_re = padb(tgt_re[:, pp_b])
        tb_im = padb(tgt_im[:, pp_b])
        epr, epi = _cmul(ta_re, ta_im, tb_re, tb_im)
        fpr = ta_re * sb_re - ta_im * sb_im + sa_re * tb_re - sa_im * tb_im
        fpi = ta_re * sb_im + ta_im * sb_re + sa_re * tb_im + sa_im * tb_re
        gr, gi = _cmul(sa_re, sa_im, sb_re, sb_im)
        gpr = jnp.broadcast_to(gr, (q, Bp)).astype(jnp.float32)
        gpi = jnp.broadcast_to(gi, (q, Bp)).astype(jnp.float32)
        return (epr, epi, fpr, fpi, gpr, gpi)
    apr, api = _cmul(da_re, da_im, db_re, db_im)
    bpr = sa_re * db_re - sa_im * db_im + sb_re * da_re - sb_im * da_im
    bpi = sa_re * db_im + sa_im * db_re + sb_re * da_im + sb_im * da_re
    cr, ci = _cmul(sa_re, sa_im, sb_re, sb_im)
    cpr = jnp.broadcast_to(cr, (q, Bp)).astype(jnp.float32)
    cpi = jnp.broadcast_to(ci, (q, Bp)).astype(jnp.float32)
    return (apr, api, bpr, bpi, cpr, cpi)


def init_flags(cfg: HCConfig, Bp: int):
    """Fresh per-path tracker state rows (8, Bp); see _F_* layout."""
    z = jnp.zeros((1, Bp), jnp.float32)
    return jnp.concatenate(
        [
            z,
            jnp.full((1, Bp), cfg.init_delta_t, jnp.float32),
            z,
            z,
            jnp.full((1, Bp), 1.0 if cfg.truncate_paths else 0.0,
                     jnp.float32),
            z,
            z,
            z,
        ],
        axis=0,
    )


def flags_outputs(cfg: HCConfig, fl, B: int):
    """flags (8, Bp) -> (converged, inf_fail, pruned, num_steps), (B,)."""
    fl = fl[:, :B]
    t = fl[_F_T]
    converged = (t >= 1.0) | (1.0 - t <= cfg.t_converged_eps)
    return (
        converged,
        fl[_F_INF] > 0.5,
        fl[_F_PRN] > 0.5,
        fl[_F_NST].astype(jnp.int32),
    )


def _wrap_track(cfg, _track_planes):
    def track(x0, target_params, diff_params) -> TrackResult:
        x0 = np.asarray(x0)
        tgt = np.asarray(target_params)
        diff = np.asarray(diff_params)
        f32 = np.float32
        xr, xi, conv, inf, pruned, steps = _track_planes(
            x0.real.astype(f32), x0.imag.astype(f32),
            tgt.real.astype(f32), tgt.imag.astype(f32),
            diff.real.astype(f32), diff.imag.astype(f32),
        )
        x = np.asarray(xr) + 1j * np.asarray(xi)
        return TrackResult(
            x=x.astype(np.complex64),
            converged=np.asarray(conv),
            inf_fail=np.asarray(inf),
            pruned=np.asarray(pruned),
            num_steps=np.asarray(steps),
        )

    track.jitted = _track_planes
    return track


def make_track_fn(
    problem: TrifocalProblem,
    cfg: HCConfig,
    tile: int = 256,
    interpret: bool = False,
    dynamic_start: bool = False,
    coef_builder=None,
):
    """Build the fused path-tracking function (ops/tracker.py-compatible).

    Returned ``track(x0, target_params, diff_params) -> TrackResult`` plus
    ``track.jitted`` taking/returning f32 planes, batch-first -- the same
    contract as tracker.make_track_fn so the engine can swap backends.

    dynamic_start: derive each path's start system as target - diff instead
    of the problem's static start parameters -- used by the monodromy
    generator to track between arbitrary parameter points.
    """
    solver = "schedule" if cfg.rk_jacobian_reuse else cfg.solver
    c = FusedConstants.build(problem, solver=solver)
    run = build_kernel_caller(
        c, problem, cfg, tile, cfg.max_steps + 1, interpret
    )
    perm = np.asarray(c.perm)
    inv = np.argsort(perm)

    @jax.jit
    def _track_planes(x0_re, x0_im, tgt_re, tgt_im, diff_re, diff_im):
        B = x0_re.shape[0]
        Bp = -(-B // tile) * tile

        def padb(a):
            if Bp != B:
                a = jnp.concatenate(
                    [a, jnp.broadcast_to(a[:1], (Bp - B,) + a.shape[1:])],
                    axis=0,
                )
            return a.T

        if coef_builder is not None:
            # Alternative homotopy parameterisations (e.g. the P2C
            # coefficient homotopy, ops/p2c.py) supply their own per-path
            # quadratic product coefficients; the kernel is agnostic.
            coefs = coef_builder(diff_re, diff_im, Bp, tgt_re, tgt_im)
        else:
            coefs = build_pair_coefs(
                problem, diff_re, diff_im, Bp, tgt_re, tgt_im,
                basis=cfg.pair_coef_basis, dynamic_start=dynamic_start,
            )
        x_re = padb(x0_re)[perm]   # permuted variable order, batch-last
        x_im = padb(x0_im)[perm]
        state = (x_re, x_im, x_re, x_im, init_flags(cfg, Bp))
        xr, xi, _, _, fl = run(state, coefs)
        xr = xr[inv][:, :B].T  # back to original var order, batch-first
        xi = xi[inv][:, :B].T
        return (xr, xi) + flags_outputs(cfg, fl, B)

    track = _wrap_track(cfg, _track_planes)
    track.constants = c
    return track
