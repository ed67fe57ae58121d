#!/usr/bin/env python
"""Per-phase microbenchmark of the fused kernel's hot-loop pieces on TPU.

Times one RK-stage evaluation, assembly, solve, P-cache fill and the full
HC step in isolation by running each phase inside a fori_loop on realistic
state, with a slight per-iteration t perturbation to defeat loop-invariant
hoisting.  Two iteration counts are timed and the difference divided, so
fixed launch/transfer costs cancel (axon d2h sync is ~24 ms; see
.claude/skills/verify/SKILL.md).

Usage: python tools/microbench_fused.py [phase ...]
Phases: fillp eval evasm evsolve replay step   (default: all; "replay" =
the CJR corrector iteration, compare against "evsolve")
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trifocal_pose_estimation_using_improved_gpuhc_tpu.models.trifocal import (
    TrifocalProblem,
)
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import fused, ransac
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils import data_io
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
    EngineConfig,
    ransac_data_dir,
)

import os

TILE = int(os.environ.get("TPUHC_TILE", "256"))
TILES = max(1, 2048 // TILE)


def build_phase_kernel(c, cfg, phase: str, T: int):
    n = 30
    width = n + 2

    def kernel(niter, x0_re, x0_im,
               apr, api, bpr, bpi, cpr, cpi,
               ohx23, ohx2g, ohx3g, ohq23, chx, cht, chtneg,
               ohg, fold_h, fold_t,
               out,
               m_sc, sv_re, sv_im, used, xe_re, xe_im,
               agq, px, prk, foh, ffr, ffi, rr_re, rr_im):
        consts = (ohx23[:], ohx2g[:], ohx3g[:], chx[:], cht[:], chtneg[:])
        consts_m = (ohx23[:], ohg[:], fold_h[:], fold_t[:])
        consts_s = tuple(a.astype(jnp.bfloat16) for a in consts)
        consts_ms = tuple(a.astype(jnp.bfloat16) for a in consts_m)
        consts_k = (
            jnp.concatenate([consts_ms[0]] * 3, axis=1),
            jnp.concatenate([consts_ms[1]] * 3, axis=1),
            consts_ms[2], consts_ms[3],
        )
        for i, (a, b) in enumerate(((apr, api), (bpr, bpi), (cpr, cpi))):
            wide = jnp.concatenate([a[:], b[:]], axis=1)
            agq[i] = fused._dot(ohq23[:], wide)
        ones = jnp.ones((1, T), jnp.float32)
        zeros = jnp.zeros((1, T), jnp.float32)
        xp_w = jnp.concatenate(
            [jnp.concatenate([x0_re[:], ones], 0),
             jnp.concatenate([x0_im[:], zeros], 0)], axis=1)
        out[:] = jnp.zeros((n, T), jnp.float32)

        def body(i, carry):
            tval = 0.31 + i.astype(jnp.float32) * 1e-7
            t_w = jnp.full((1, 2 * T), tval, jnp.float32)
            if phase == "fillp":
                fused._fill_P(c, prk, agq, t_w, rk=True,
                              basis=cfg.hc.pair_coef_basis)
                out[0:1] += prk[0:1, :T]
            elif phase == "mm5":
                # The eval's 5 matmuls chained, no complex products.
                xp = xp_w + prk[0:1] * 0.0 + t_w
                fac = fused._dot(ohx23[:], xp)
                a2 = fused._dot(ohx2g[:], fac[:c.qpad])
                a3 = fused._dot(ohx3g[:], fac[c.sec_a:c.sec_a + c.cpad])
                hx = fused._dot(chx[:], a2)
                rhs = fused._dot(cht[:], a3)
                out[:] += rhs[:, :T] + hx[:n, :T]
            elif phase in ("mm5d", "mm5b"):
                # Same 5 matmuls at DEFAULT precision / explicit bf16.
                def dd(a, b):
                    if phase == "mm5b":
                        a = a.astype(jnp.bfloat16)
                        b = b.astype(jnp.bfloat16)
                    return jax.lax.dot_general(
                        a, b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                xp = xp_w + prk[0:1] * 0.0 + t_w
                fac = dd(ohx23[:], xp)
                a2 = dd(ohx2g[:], fac[:c.qpad])
                a3 = dd(ohx3g[:], fac[c.sec_a:c.sec_a + c.cpad])
                hx = dd(chx[:], a2)
                rhs = dd(cht[:], a3)
                out[:] += rhs[:, :T] + hx[:n, :T]
            elif phase == "mm5s":
                # 3-term bf16 split: exact-to-f32 gathers at 3 passes.
                def sdot(cb, x):
                    hi = x.astype(jnp.bfloat16)
                    r1 = x - hi.astype(jnp.float32)
                    lo1 = r1.astype(jnp.bfloat16)
                    lo2 = (r1 - lo1.astype(jnp.float32)).astype(jnp.bfloat16)
                    def d(a, b):
                        return jax.lax.dot_general(
                            a, b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    return d(cb, hi) + d(cb, lo1) + d(cb, lo2)
                bf = jnp.bfloat16
                xp = xp_w + prk[0:1] * 0.0 + t_w
                fac = sdot(ohx23[:].astype(bf), xp)
                a2 = sdot(ohx2g[:].astype(bf), fac[:c.qpad])
                a3 = sdot(ohx3g[:].astype(bf), fac[c.sec_a:c.sec_a + c.cpad])
                hx = sdot(chx[:].astype(bf), a2)
                rhs = sdot(cht[:].astype(bf), a3)
                out[:] += rhs[:, :T] + hx[:n, :T]
            elif phase == "front":
                # fac matmul + the two front complex products.
                xp = xp_w + prk[0:1] * 0.0 + t_w
                fac = fused._dot(ohx23[:], xp)
                a = c.sec_a
                u = fused._cmul_w(fac[:a], fac[a:2 * a], T)
                x3 = fused._cmul_w(u[c.qpad:], fac[2 * a + c.qpad:], T)
                out[:] += u[:n, :T] + x3[:n, :T]
            elif phase == "back":
                sv_re[0, 0:1] = sv_re[0, 0:1] + t_w[:, :T]
                if c.reduced is not None:
                    dr, di = fused._reduce_backsub(
                        c, sv_re, sv_im, xe_re, xe_im, T)
                else:
                    dr, di = fused._backsub(c, sv_re, sv_im, xe_re, xe_im, T)
                out[:] += dr + di
            elif phase == "evals":
                # Production path: old 5-dot structure at split3.
                fused._fill_P(c, prk, agq, t_w, rk=True,
                              basis=cfg.hc.pair_coef_basis)
                hx, rhs = fused._eval_core(
                    c, consts_s, prk[:], xp_w, T, want_h=False,
                    dot=fused._sdot)
                out[:] += rhs[:, :T] + hx[:n, :T]
            elif phase == "evalsk":
                # Classic structure, K-concatenated splits: 5 matmul
                # issues instead of 15 (eval_precision="split3k").
                fused._fill_P(c, prk, agq, t_w, rk=True,
                              basis=cfg.hc.pair_coef_basis)
                ck = tuple(jnp.concatenate([cb] * 3, axis=1)
                           for cb in consts_s)
                hx, rhs = fused._eval_core(
                    c, ck, prk[:], xp_w, T, want_h=False,
                    dot=fused._kdot)
                out[:] += rhs[:, :T] + hx[:n, :T]
            elif phase == "evalm":
                # Merged 3-dot structure at split3.
                fused._fill_P(c, prk, agq, t_w, rk=True,
                              basis=cfg.hc.pair_coef_basis)
                hx, rhs = fused._eval_core_merged(
                    c, consts_ms, prk[:], xp_w, T, want_h=False,
                    dot=fused._sdot)
                out[:] += rhs[:, :T] + hx[:n, :T]
            elif phase == "evalk":
                # Merged + K-concat split gathers (production candidate).
                fused._fill_P(c, prk, agq, t_w, rk=True,
                              basis=cfg.hc.pair_coef_basis)
                hx, rhs = fused._eval_core_merged(
                    c, consts_k, prk[:], xp_w, T, want_h=False,
                    dot_g=fused._kdot, dot_f=fused._sdot)
                out[:] += rhs[:, :T] + hx[:n, :T]
            elif phase == "evalf":
                # Fold-only merge: separate gathers, one block-diag fold.
                fused._fill_P(c, prk, agq, t_w, rk=True,
                              basis=cfg.hc.pair_coef_basis)
                sdot = fused._sdot
                a = c.sec_a
                fac = sdot(consts_s[0], xp_w)
                u = fused._cmul_w(fac[:a], fac[a:2 * a], T)
                x3 = fused._cmul_w(u[c.qpad:], fac[2 * a + c.qpad:], T)
                px2 = sdot(consts_s[1], u[:c.qpad])
                px3 = sdot(consts_s[2], x3)
                pxv = fused._cmul_w(
                    prk[:], jnp.concatenate([px2, px3], axis=0), T)
                o = sdot(consts_ms[3], pxv)
                out[:] += o[c.nzp:c.nzp + n, :T] + o[:n, :T]
            elif phase == "evalg":
                # Gather-only merge: one gather, separate folds (the
                # production "gathered" structure, bit-identical to
                # classic split3).
                fused._fill_P(c, prk, agq, t_w, rk=True,
                              basis=cfg.hc.pair_coef_basis)
                cg = (consts_s[0], consts_ms[1], consts_s[3],
                      consts_s[4], consts_s[5])
                hx, rhs = fused._eval_core_gathered(
                    c, cg, prk[:], xp_w, T, want_h=False,
                    dot=fused._sdot)
                out[:] += rhs[:, :T] + hx[:n, :T]
            elif phase == "evalgk":
                # Gathered structure + K-concatenated splits: 4 matmul
                # issues per evaluation (vs evalsk's 5).  The combined
                # combo gather was slightly SLOWER than classic at
                # per-matmul split3 (evalg 5.35 vs evals 5.07, campaign
                # 9) because its wider gather added a 3x-split call; at
                # kconcat every structure pays one call per matmul, so
                # the call-count argument flips in gathered's favor.
                fused._fill_P(c, prk, agq, t_w, rk=True,
                              basis=cfg.hc.pair_coef_basis)
                cg = (consts_s[0], consts_ms[1], consts_s[3],
                      consts_s[4], consts_s[5])
                ckg = tuple(jnp.concatenate([cb] * 3, axis=1)
                            for cb in cg)
                hx, rhs = fused._eval_core_gathered(
                    c, ckg, prk[:], xp_w, T, want_h=False,
                    dot=fused._kdot)
                out[:] += rhs[:, :T] + hx[:n, :T]
            elif phase == "replay":
                # CJR corrector iteration: H-only eval + saved-
                # factorization rhs replay (compare against "evsolve",
                # the full corrector iteration it replaces).  The
                # save-solve runs once at i == 0 and cancels in the
                # two-point timing difference.
                @pl.when(i == 0)
                def _():
                    fused._fill_P(c, prk, agq, t_w, rk=False,
                              basis=cfg.hc.pair_coef_basis)
                    hx0, rhs0 = fused._eval_core(
                        c, consts, prk[:], xp_w, T, want_h=True)
                    fused._assemble(c, m_sc, hx0, rhs0, T)
                    fused._solve(c, m_sc, sv_re, sv_im, used,
                                 xe_re, xe_im, T, save=(foh, ffr, ffi))
                fused._fill_P(c, prk, agq, t_w, rk=False,
                              basis=cfg.hc.pair_coef_basis)
                _, rhs = fused._eval_core(
                    c, consts, prk[:], xp_w, T, want_h=True,
                    need_hx=False)
                rp = (fused._reduce_resolve_rhs if c.reduced is not None
                      else fused._resolve_rhs)
                dr, di = rp(c, sv_re, sv_im, foh, ffr, ffi, rr_re, rr_im,
                            xe_re, xe_im, rhs, T)
                out[:] += dr + di
            elif phase == "elimfam":
                # Family stages only (6 triples + 4 quads + 2 pairs as 3
                # batched stages + survivor compaction); pairs with
                # "elimtail" to split the "elim" phase's cost.
                prev = []
                for fam in c.reduced.fams:
                    prev.append(fused._fam_forward(
                        c, fam, m_sc, sv_re, sv_im, T, prev))
                out[:] += sv_re[:, 0, :] + sv_im[:, 0, :]
            elif phase == "elimtail":
                # The 14 sequential reduced stages only, run on the raw
                # (uncompacted) assembly -- the timing is shape-
                # determined, so this isolates the tail's cost without
                # the family prerequisites.
                red = c.reduced
                co = red.col_off
                n_ = len(c.perm)
                width_ = n_ + 2
                used[0:red.n2] = jnp.zeros((red.n2, T), jnp.float32)
                for group, runs, lo in red.red_plan:
                    nc = sum(hi - lo_r for lo_r, hi in runs)
                    all_fresh = group[0][3]
                    if len(runs) == 1:
                        r0, r1 = runs[0]
                        Mw = m_sc[r0:r1, co + lo:width_]
                        ure = (jnp.zeros((nc, T), jnp.float32) if all_fresh
                               else used[r0:r1])
                    else:
                        Mw = jnp.concatenate(
                            [m_sc[a:b, co + lo:width_] for a, b in runs], 0)
                        ure = (jnp.zeros((nc, T), jnp.float32) if all_fresh
                               else jnp.concatenate(
                                   [used[a:b] for a, b in runs], 0))
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
                        rid = jax.lax.broadcasted_iota(
                            jnp.int32, (nc, T), 0)
                        first = jnp.min(jnp.where(hit, rid, nc), axis=0,
                                        keepdims=True)
                        oh = (rid == first).astype(jnp.float32)
                        prow_re = jnp.sum(oh[:, None, :] * Mre, axis=0)
                        prow_im = jnp.sum(oh[:, None, :] * Mim, axis=0)
                        sv_re[co + s, co + lo:width_] = prow_re
                        sv_im[co + s, co + lo:width_] = prow_im
                        pr = prow_re[jcol:jcol + 1]
                        pi = prow_im[jcol:jcol + 1]
                        den = pr * pr + pi * pi
                        den = jnp.where(den == 0.0, 1.0, den)
                        fr, fi = fused._cmul(cr, ci, pr / den, -pi / den)
                        nm = 1.0 - oh
                        fr = fr * nm
                        fi = fi * nm
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
                        m_sc[a:b, co + lo:width_] = new_w[off:off + w_r]
                        if not last_any:
                            used[a:b] = ure[off:off + w_r]
                        off += w_r
                out[:] += sv_re[:, 0, :] + sv_im[:, 0, :]
            elif phase == "evrhs":
                # Evaluation without the Hx half (the RKJ rhs-only path):
                # isolates the hx-branch cost within "eval".
                fused._fill_P(c, prk, agq, t_w, rk=True,
                              basis=cfg.hc.pair_coef_basis)
                _, rhs = fused._eval_core(
                    c, consts, prk[:], xp_w, T, want_h=False,
                    need_hx=False)
                out[:] += rhs[:, :T]
            else:
                fused._fill_P(c, prk, agq, t_w, rk=True,
                              basis=cfg.hc.pair_coef_basis)
                hx, rhs = fused._eval_core(
                    c, consts, prk[:], xp_w, T, want_h=False)
                if phase == "eval":
                    out[:] += rhs[:, :T] + hx[:n, :T]
                else:
                    fused._assemble(c, m_sc, hx, rhs, T)
                    if phase == "evasm":
                        out[:] += m_sc[:, 0, :T]
                    elif phase == "elim":
                        if c.reduced is not None:
                            fused._reduce_forward(
                                c, m_sc, sv_re, sv_im, used, T)
                        else:
                            fused._eliminate(c, m_sc, sv_re, sv_im, used, T)
                        out[:] += sv_re[:, 0, :] + sv_im[:, 0, :]
                    else:
                        dr, di = fused._solve(
                            c, m_sc, sv_re, sv_im, used, xe_re, xe_im, T)
                        out[:] += dr + di
            return carry

        jax.lax.fori_loop(0, niter[0], body, 0)

    return kernel, n, width


def run_phase(problem, cfg, phase: str, iters: int):
    c = fused.FusedConstants.build(problem, solver=cfg.hc.solver)
    T = TILE
    kernel, n, width = build_phase_kernel(c, cfg, phase, T)
    kp = c.kp

    view = data_io.load_ransac_view(ransac_data_dir(cfg), 0)
    samples = ransac.sample_edgel_triplets(0, view.edge_locations.shape[0], 1)
    tgt = ransac.build_target_params(
        view.edge_locations, view.edge_tangents, samples)
    Bp = TILE * TILES
    tgt_b = np.repeat(tgt, Bp, axis=0)
    diff_b = (tgt_b - problem.start_params).astype(np.complex64)
    reps = -(-Bp // problem.num_tracks)
    x0 = np.tile(np.asarray(problem.start_sols), (reps, 1))[:Bp]
    coefs = fused.build_pair_coefs(
        problem, jnp.asarray(diff_b.real), jnp.asarray(diff_b.imag), Bp,
        jnp.asarray(tgt_b.real.astype(np.float32)),
        jnp.asarray(tgt_b.imag.astype(np.float32)),
        basis=cfg.hc.pair_coef_basis, dynamic_start=False)
    perm = np.asarray(c.perm)
    xb = x0.T[perm]

    grid_consts = [jnp.asarray(a) for a in (
        c.ohx23, c.ohx2g, c.ohx3g, c.ohq23, c.chx, c.cht, c.chtneg,
        c.ohg, c.fold_h, c.fold_t)]

    def _const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def _tile_spec(rows):
        return pl.BlockSpec((rows, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def go(niter, xr, xi, *args):
        return pl.pallas_call(
            kernel,
            grid=(TILES,),
            out_shape=jax.ShapeDtypeStruct((n, Bp), jnp.float32),
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                      + [_tile_spec(n)] * 2
                      + [_tile_spec(c.q)] * 6
                      + [_const_spec(a) for a in grid_consts]),
            out_specs=_tile_spec(n),
            scratch_shapes=[
                pltpu.VMEM((n, width, 2 * TILE), jnp.float32),
                pltpu.VMEM((n, width, TILE), jnp.float32),
                pltpu.VMEM((n, width, TILE), jnp.float32),
                pltpu.VMEM((n, TILE), jnp.float32),
                pltpu.VMEM((width, TILE), jnp.float32),
                pltpu.VMEM((width, TILE), jnp.float32),
                pltpu.VMEM((3, kp, 2 * TILE), jnp.float32),
                pltpu.VMEM((kp, 2 * TILE), jnp.float32),
                pltpu.VMEM((kp, 2 * TILE), jnp.float32),
                pltpu.VMEM((n, n, TILE), jnp.float32),
                pltpu.VMEM((n, n, TILE), jnp.float32),
                pltpu.VMEM((n, n, TILE), jnp.float32),
                pltpu.VMEM((n, TILE), jnp.float32),
                pltpu.VMEM((n, TILE), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(niter, xr, xi, *args)

    args = (jnp.asarray(xb.real, jnp.float32),
            jnp.asarray(xb.imag, jnp.float32)) + tuple(coefs) + tuple(
        grid_consts)

    def timed(ni):
        o = go(jnp.full((1,), ni, jnp.int32), *args)
        t0 = time.perf_counter()
        o = go(jnp.full((1,), ni, jnp.int32), *args)
        np.asarray(o[0, 0])  # d2h fence (block_until_ready is a no-op on axon)
        return time.perf_counter() - t0

    timed(4)  # warm compile + cache
    t1 = min(timed(iters) for _ in range(5))
    t2 = min(timed(2 * iters) for _ in range(5))
    per_iter_us = (t2 - t1) / iters / TILES * 1e6
    return per_iter_us


def run_step(problem, cfg, iters: int):
    """Full one_step cost via the production kernel with fresh state."""
    c = fused.FusedConstants.build(problem, solver=cfg.hc.solver)
    run = fused.build_kernel_caller(c, problem, cfg.hc, TILE, iters, False)
    view = data_io.load_ransac_view(ransac_data_dir(cfg), 0)
    samples = ransac.sample_edgel_triplets(0, view.edge_locations.shape[0], 1)
    tgt = ransac.build_target_params(
        view.edge_locations, view.edge_tangents, samples)
    Bp = TILE * TILES
    tgt_b = np.repeat(tgt, Bp, axis=0)
    diff_b = (tgt_b - problem.start_params).astype(np.complex64)
    reps = -(-Bp // problem.num_tracks)
    x0 = np.tile(np.asarray(problem.start_sols), (reps, 1))[:Bp]
    perm = np.asarray(c.perm)
    xb = x0.T[perm]

    @jax.jit
    def go(ni):
        coefs = fused.build_pair_coefs(
            problem, jnp.asarray(diff_b.real), jnp.asarray(diff_b.imag), Bp,
            jnp.asarray(tgt_b.real.astype(np.float32)),
            jnp.asarray(tgt_b.imag.astype(np.float32)),
            basis=cfg.hc.pair_coef_basis, dynamic_start=False)
        xr = jnp.asarray(xb.real, jnp.float32)
        xi = jnp.asarray(xb.imag, jnp.float32)
        state = (xr, xi, xr, xi, fused.init_flags(cfg.hc, Bp))
        out = run(state, coefs, niter=ni)
        return out[0]

    def timed(ni):
        o = go(jnp.full((1,), ni, jnp.int32))
        t0 = time.perf_counter()
        o = go(jnp.full((1,), ni, jnp.int32))
        np.asarray(o[0, 0])
        return time.perf_counter() - t0

    timed(2)
    lo, hi = max(2, iters // 4), iters // 2
    t1 = min(timed(lo) for _ in range(3))
    t2 = min(timed(hi) for _ in range(3))
    return (t2 - t1) / (hi - lo) / TILES * 1e6


def main():
    import dataclasses

    args = sys.argv[1:]
    cfg = EngineConfig()
    if "--schedule" in args:
        args.remove("--schedule")
        cfg = dataclasses.replace(
            cfg, hc=dataclasses.replace(cfg.hc, solver="schedule")
        )
    for flag, structure in (("--classic", "classic"),
                            ("--gathered", "gathered"),
                            ("--merged", "merged")):
        # A/B the full step's evaluator structure explicitly.
        if flag in args:
            args.remove(flag)
            cfg = dataclasses.replace(
                cfg, hc=dataclasses.replace(cfg.hc, eval_structure=structure)
            )
    phases = args or [
        "fillp", "mm5", "front", "eval", "evasm", "elim", "back",
        "evsolve", "step",
    ]
    problem = TrifocalProblem.load(cfg)
    print(f"solver: {cfg.hc.solver}  eval_structure: {cfg.hc.eval_structure}")
    for ph in phases:
        if ph == "step":
            us = run_step(problem, cfg, 64)
        else:
            us = run_phase(problem, cfg, ph, 500)
        print(f"{ph:8s}: {us:8.2f} us/iter/tile (tile={TILE})")


if __name__ == "__main__":
    main()
