"""P2C ablation evaluator: params -> coefficients -> indexed evaluation.

The reference's ablation ladder starts from the original GPU-HC evaluation
strategy "P2C": convert the 33 target/start parameters into 37 precomputed
coefficient polynomials in t, then evaluate H / dHdx / dHdt against
coefficient-indexed tables (arxived_GPU_code/gpu-idx-evals/
dev-eval-indxing-trifocal_2op1p_30x30_P2C.cuh:30-110; tables D3 in
SURVEY.md).  The reference tree ships the P2C index tables but NOT the
host-side params->coefficients conversion code, so the variant cannot run
there at all.

Here the conversion is *derived numerically*: every P2C coefficient is a
linear combination of the framework's parameter-pair products P_q (the
homotopy is degree-2 in parameters, so pair products span the coefficient
space).  ``derive_coeff_map`` fits that matrix once by least squares
against the PH evaluator on random inputs, and ``make_p2c_evaluator``
returns table-driven H/Hx/-Ht functions matching ops/eval.py semantics --
completing the PH-vs-P2C ablation the papers report (README.md:5,
strategy (PH)).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import numpy as np

from trifocal_pose_estimation_using_improved_gpuhc_tpu.models.trifocal import (
    TrifocalProblem,
)
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import eval as ev


@dataclasses.dataclass(frozen=True)
class P2CTables:
    hx: np.ndarray      # (E, V, terms, 4) int: [coeff, c_idx, v1, v2]
    ht: np.ndarray      # (E, terms, 5) int: [coeff, c_idx, v1, v2, v3]
    n_coeffs: int       # coefficient slots (incl. the zero-pad slot)
    coeff_map: np.ndarray  # (n_coeffs, Q) complex64: c = coeff_map @ P


def load_p2c_tables(problem_dir: str, num_vars: int = 30,
                    hx_terms: int = 8, ht_terms: int = 16) -> Tuple[np.ndarray, np.ndarray]:
    hx = np.loadtxt(os.path.join(problem_dir, "dHdx_indx_P2C.txt"),
                    dtype=np.int64)
    ht = np.loadtxt(os.path.join(problem_dir, "dHdt_indx_P2C.txt"),
                    dtype=np.int64)
    # Layout determined empirically against the PH evaluator (residual
    # 6e-8): (equation, variable, term, part) with parts innermost -- the
    # archived kernel's d_Hx_idx[j*parts + part + i*off + tx*row] order
    # (...P2C.cuh:75-82).
    hx = hx.reshape(num_vars, num_vars, hx_terms, 4)
    ht = ht.reshape(num_vars, ht_terms, 5)
    return hx, ht


def _pair_products(problem: TrifocalProblem, p: np.ndarray) -> np.ndarray:
    """P_q = p[a]*p[b] for the factored pair list; p (..., P+1)."""
    f = problem.factored
    return p[..., np.asarray(f.pp_a)] * p[..., np.asarray(f.pp_b)]


def _coeff_design(tables_hx: np.ndarray, tables_ht: np.ndarray,
                  n_coeffs: int, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Linear maps from coefficient values to Hx entries / H values at x."""
    V = tables_hx.shape[0]
    xp = np.concatenate([x, np.ones(1, x.dtype)])
    # Hx[e, v] = sum_j c_int * coeffs[k] * x[v1] * x[v2]
    design_hx = np.zeros((V * V, n_coeffs), np.complex128)
    for e in range(V):
        for v in range(V):
            for (ci, k, v1, v2) in tables_hx[e, v]:
                design_hx[e * V + v, k] += ci * xp[v1] * xp[v2]
    design_h = np.zeros((V, n_coeffs), np.complex128)
    for e in range(V):
        for (ci, k, v1, v2, v3) in tables_ht[e]:
            design_h[e, k] += ci * xp[v1] * xp[v2] * xp[v3]
    return design_hx, design_h


def derive_coeff_map(problem: TrifocalProblem, problem_dir: str,
                     samples: int = 120, rng_seed: int = 0) -> P2CTables:
    """Fit coefficients-as-pair-product-combinations by least squares.

    For random (x, p) the PH evaluator gives exact Hx/H values; the P2C
    tables give them as linear functions of the unknown coefficient values,
    so each sample yields c(p) by least squares, and stacking samples gives
    the linear map from pair products P(p) to c.
    """
    import jax

    f = problem.factored
    hx_t, ht_t = load_p2c_tables(problem_dir, problem.num_vars)
    n_coeffs = int(max(hx_t[..., 1].max(), ht_t[..., 1].max())) + 1
    rng = np.random.default_rng(rng_seed)
    V = problem.num_vars

    # The PH-evaluator probes use complex64 device arrays; run them on the
    # CPU backend (complex arrays cannot cross the host<->device boundary
    # on some TPU runtimes).
    _cpu = jax.default_device(jax.devices("cpu")[0])
    _cpu.__enter__()

    # Several fixed generic x's make the coefficient system uniquely
    # determined (one x leaves a null space, and an inconsistent per-sample
    # basis would poison the pair-product fit).
    xs = [rng.standard_normal(V) + 1j * rng.standard_normal(V)
          for _ in range(6)]
    designs = [np.concatenate(_coeff_design(hx_t, ht_t, n_coeffs, x))
               for x in xs]
    design = np.concatenate(designs)

    c_rows, p_rows = [], []
    max_res = 0.0
    for s in range(samples):
        p = rng.standard_normal(34) + 1j * rng.standard_normal(34)
        p[33] = 1.0
        rhs_parts = []
        for x in xs:
            hx_ref = np.asarray(
                ev.eval_Hx_direct(problem, x[None].astype(np.complex64),
                                  p[None].astype(np.complex64))
            )[0].astype(np.complex128)
            h_ref = np.asarray(
                ev.eval_H_direct(problem, x[None].astype(np.complex64),
                                 p[None].astype(np.complex64))
            )[0].astype(np.complex128)
            rhs_parts.append(np.concatenate([hx_ref.reshape(-1), h_ref]))
        rhs = np.concatenate(rhs_parts)
        c, res, rank, _ = np.linalg.lstsq(design, rhs, rcond=None)
        fit = np.abs(design @ c - rhs).max() / max(np.abs(rhs).max(), 1.0)
        max_res = max(max_res, float(fit))
        c_rows.append(c)
        p_rows.append(_pair_products(problem, p))
    if max_res > 1e-3:
        raise ValueError(
            f"P2C tables do not reproduce the PH evaluation (residual "
            f"{max_res:.2e}): table interpretation mismatch"
        )
    _cpu.__exit__(None, None, None)
    C = np.stack(c_rows)           # (S, n_coeffs)
    P = np.stack(p_rows)           # (S, Q)
    M, *_ = np.linalg.lstsq(P, C, rcond=None)  # (Q, n_coeffs)
    return P2CTables(
        hx=hx_t.astype(np.int32),
        ht=ht_t.astype(np.int32),
        n_coeffs=n_coeffs,
        coeff_map=M.T.astype(np.complex64),
    )


def make_p2c_problem(problem: TrifocalProblem, tables: P2CTables) -> TrifocalProblem:
    """Recast the P2C tables as a TrifocalProblem in COEFFICIENT space.

    The P2C strategy's "parameters" are the 37 precomputed coefficients;
    each table term [c_int, c_idx, v...] becomes a PH-format term
    [c_int, c_idx, const_slot, v...] (the coefficient paired with the
    constant-1 parameter slot).  The monomial factoring, the static solve
    schedule, and the fused Pallas kernel then apply UNCHANGED -- the only
    P2C-specific piece is the per-path quadratic coefficient polynomials
    (make_fused_p2c_track_fn).  This completes the papers' PH-vs-P2C
    ablation on the production kernel (the reference archived the P2C
    kernels without the params->coefficients conversion,
    arxived_GPU_code/README_arxived_GPU_code.md:4-9).
    """
    from trifocal_pose_estimation_using_improved_gpuhc_tpu.models.trifocal import (
        _factor_tables,
    )

    V = problem.num_vars
    C = tables.n_coeffs
    hx_t, ht_t = tables.hx, tables.ht
    terms_x = hx_t.shape[2]
    terms_t = ht_t.shape[1]
    hx5 = np.zeros((V, V, terms_x, 5), np.int64)
    hx5[..., 0] = hx_t[..., 0]
    hx5[..., 1] = hx_t[..., 1]
    hx5[..., 2] = C                     # constant-1 parameter slot
    hx5[..., 3] = hx_t[..., 2]
    hx5[..., 4] = hx_t[..., 3]
    ht6 = np.zeros((V, terms_t, 6), np.int64)
    ht6[..., 0] = ht_t[..., 0]
    ht6[..., 1] = ht_t[..., 1]
    ht6[..., 2] = C
    ht6[..., 3] = ht_t[..., 2]
    ht6[..., 4] = ht_t[..., 3]
    ht6[..., 5] = ht_t[..., 4]

    # models.trifocal._factor_tables expects the Data_Reader layouts
    # (var, term, part, eq) / (term, part, eq) (data_io.load_problem_data).
    hx5 = hx5.transpose(1, 2, 3, 0)
    ht6 = ht6.transpose(1, 2, 0)
    start_p = np.asarray(problem.start_params)
    c_start = tables.coeff_map @ _pair_products(problem, start_p)
    return TrifocalProblem(
        num_vars=V,
        num_params=C,
        num_tracks=problem.num_tracks,
        start_params=np.concatenate(
            [c_start, np.ones(1, np.complex64)]
        ).astype(np.complex64),
        start_sols=problem.start_sols,
        hx_table=hx5,
        ht_table=ht6,
        factored=_factor_tables(hx5, ht6),
    )


def make_fused_p2c_track_fn(problem: TrifocalProblem, tables: P2CTables,
                            cfg, tile: int = 256, interpret: bool = False):
    """The P2C variant on the PRODUCTION fused Pallas kernel.

    Same track(x0, target_params, diff_params) contract as
    fused.make_track_fn on the original problem -- targets/diffs are the
    ordinary 34-parameter arrays; the builder maps their pair-product
    quadratics A t^2 + B t + C through the coefficient map, giving each
    coefficient's exact quadratic-in-t polynomial (the homotopy stays the
    SAME parameter homotopy, evaluated through the coefficient tables, so
    path semantics are directly comparable to PH).
    """
    from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import fused

    import jax.numpy as jnp

    pproblem = make_p2c_problem(problem, tables)
    pf = pproblem.factored
    # Every pseudo pair is (coefficient, const): P'_q(t) = c_{pp_a[q]}(t).
    assert (np.asarray(pf.pp_b) == tables.n_coeffs).all()
    rows = np.asarray(pf.pp_a)
    M = tables.coeff_map
    Mr = jnp.asarray(M.real[rows].astype(np.float32))   # (Q', Q)
    Mi = jnp.asarray(M.imag[rows].astype(np.float32))

    def coef_builder(diff_re, diff_im, Bp, tgt_re=None, tgt_im=None):
        # The coefficient map is LINEAR in the pair quadratics, so it is
        # basis-agnostic: mapping (E, F, G) gives the coefficients'
        # two-point quadratics exactly as mapping (A, B, C) gives their
        # monomial ones.  Follow the kernel's configured basis.
        base = fused.build_pair_coefs(
            problem, diff_re, diff_im, Bp, tgt_re, tgt_im,
            basis=cfg.pair_coef_basis, dynamic_start=False,
        )
        out = []
        for re, im in zip(base[0::2], base[1::2]):
            out.append(Mr @ re - Mi @ im)
            out.append(Mr @ im + Mi @ re)
        return tuple(out)

    return fused.make_track_fn(
        pproblem, cfg, tile=tile, interpret=interpret,
        coef_builder=coef_builder,
    )


def make_p2c_evaluator(problem: TrifocalProblem, tables: P2CTables):
    """Table-driven P2C evaluators (host/oracle tier, like ops/eval.py).

    Returns eval_p2c(x (B,V), start (P+1,), target (B,P+1), t (B,)) ->
    (Hx (B,E,V), H (B,E), -Ht (B,E)).  Coefficients are evaluated as
    quadratics in t from pair products of start/target -- the
    params->coefficients stage the reference archived without shipping
    (dev-eval-indxing-..._P2C.cuh:35-63).
    """
    import jax.numpy as jnp

    M = jnp.asarray(tables.coeff_map)        # (C, Q)
    hx_t = tables.hx
    ht_t = tables.ht
    f = problem.factored
    pp_a = np.asarray(f.pp_a)
    pp_b = np.asarray(f.pp_b)

    def coeffs_at(start, target, t):
        # P_q(t) for p(t) = (1-t) start + t target; quadratic in t.
        p_t = (
            target * t[:, None].astype(target.dtype)
            + start * (1.0 - t[:, None]).astype(target.dtype)
        )
        P = p_t[:, pp_a] * p_t[:, pp_b]
        return P @ M.T                        # (B, C)

    def d_coeffs_at(start, target, t):
        # d/dt of the pair products via the product rule.
        tc = t[:, None].astype(target.dtype)
        p_t = target * tc + start * (1.0 - tc)
        d = target - start
        dP = d[:, pp_a] * p_t[:, pp_b] + d[:, pp_b] * p_t[:, pp_a]
        return dP @ M.T

    def eval_p2c(x, start, target, t):
        B, V = x.shape
        xp = jnp.concatenate([x, jnp.ones((B, 1), x.dtype)], axis=1)
        c = coeffs_at(start, target, t)       # (B, C)
        dc = d_coeffs_at(start, target, t)
        ci = hx_t[..., 0].astype(np.float32)  # (E, V, T)
        k = hx_t[..., 1]
        xx = jnp.take(xp, hx_t[..., 2], axis=1) * jnp.take(
            xp, hx_t[..., 3], axis=1
        )
        hx = jnp.einsum(
            "evt,bevt->bev", ci, jnp.take(c, k, axis=1) * xx,
        )
        cit = ht_t[..., 0].astype(np.float32)  # (E, T)
        kt = ht_t[..., 1]
        xxx = (
            jnp.take(xp, ht_t[..., 2], axis=1)
            * jnp.take(xp, ht_t[..., 3], axis=1)
            * jnp.take(xp, ht_t[..., 4], axis=1)
        )
        h = jnp.einsum("et,bet->be", cit, jnp.take(c, kt, axis=1) * xxx)
        mht = -jnp.einsum("et,bet->be", cit, jnp.take(dc, kt, axis=1) * xxx)
        return hx, h, mht

    return eval_p2c
