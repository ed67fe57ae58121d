#!/usr/bin/env python
"""Static flop/issue accounting for the fused HC kernel (README roofline).

Derives, from the compiled problem constants (FusedConstants + the
condensed-solve metadata), the useful floating-point work and the
vector-op issue count of one HC step per path, phase by phase:

  * evaluation  -- 5 constant matmuls (x3 bf16 passes under split3) +
                   front/pair complex products + P-cache fills,
  * elimination -- batched family stages + compacted reduced steps,
  * backsub     -- saved-row dot recovery.
  (assembly moves data, 0 flops)

Two resource columns:
  flops     -- useful f32 floating-point operations per path per step,
  vreg-ops  -- (8, 128) vector-register operations the VPU retires at
               tile T (rows padded to 8; [re | im] planes = 2T lanes).

The point the README section makes with these numbers: one HC step is
~0.4 MFLOP/path, so even at 200k paths/s/chip the useful rate is
~0.1 TFLOP/s -- far under the v5e MXU peak (197 TFLOP/s bf16).  The
binding resource is op ISSUE (thousands of vector ops + hundreds of MXU
passes per step, each on tiny operands), which is why tile-size changes
re-shape issue counts but per-path cost stays flat, and why fewer-ops
restructures (gathered/merged eval, batched families) move the needle
while flop-reducing ones do not.

Usage:
  python tools/roofline.py [--tile 128] [--step-us 83.67]
                           [--corrector-iters 3]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--step-us", type=float, default=None,
                    help="measured full-step us/iter/tile "
                         "(tools/microbench_fused.py step) -> achieved rates")
    ap.add_argument("--corrector-iters", type=float, default=3.0,
                    help="corrector iterations charged per step (the "
                         "tile-wide skip usually retires 2-3 early)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from trifocal_pose_estimation_using_improved_gpuhc_tpu.models.trifocal import (
        TrifocalProblem,
    )
    from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import fused
    from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
        EngineConfig,
    )

    cfg = EngineConfig()
    problem = TrifocalProblem.load(cfg)
    c = fused.FusedConstants.build(problem, solver=cfg.hc.solver)
    T = args.tile
    n = 30
    width = n + 2
    lane_tiles = max(1, 2 * T // 128)   # (rows, 2T) -> lane-direction tiles

    def tiles(rows):
        return -(-rows // 8) * lane_tiles

    def mm(m, k):
        """Constant matmul (m, k) @ (k, 2T) per path: both planes ride the
        lane axis, so flops/path = 2 planes x 2 x m x k MACs / (2T lanes)
        ... i.e. per-path useful MACs = m*k (one lane per plane)."""
        return {"flops": 2 * 2 * m * k / 2,   # = 2*m*k per path
                "mxu": (-(-m // 128)) * (-(-k // 128)) * lane_tiles,
                "vreg": 0}

    def ew(rows, ops_per_row, flops_per_row=None):
        """Elementwise block on (rows, 2T): ops_per_row vector ops, each
        issuing tiles(rows) vregs; flops/path defaults to ops count."""
        fl = ops_per_row if flops_per_row is None else flops_per_row
        return {"flops": fl * rows, "mxu": 0,
                "vreg": ops_per_row * tiles(rows)}

    def acc(*ds):
        out = {"flops": 0, "mxu": 0, "vreg": 0}
        for d in ds:
            for k, v in d.items():
                out[k] += v
        return out

    def scale(d, f):
        return {k: v * f for k, v in d.items()}

    # ---- one evaluation (classic structure, hx + rhs) ------------------
    ev_mm = acc(mm(3 * c.sec_a, 31), mm(c.k2p, c.qpad), mm(c.k3p, c.cpad),
                mm(c.nnz, c.k2p), mm(n, c.k3p))
    # complex multiply on (rows, 2T) planes: 4 mul + 2 add = 6 vector ops
    # over (rows, T) halves = 3 ops per (rows, 2T)-equivalent region; count
    # against the (rows, T) half-tiles explicitly:
    def cmul(rows):
        half_tiles = -(-rows // 8) * max(1, T // 128)
        return {"flops": 6 * rows, "mxu": 0, "vreg": 6 * half_tiles + tiles(rows) // 1}
        # +tiles: the lane concat materializing the wide result

    ev_ew = acc(cmul(c.sec_a), cmul(c.cpad), cmul(c.kp))
    fill_rk = acc(ew(c.k2p, 4, 8), ew(c.k3p, 2, 4))   # quad FMAs + 2At+B
    fill_co = ew(c.kp, 4, 8)

    # ---- elimination (condensed path) ----------------------------------
    red = c.reduced
    elim = {"flops": 0, "mxu": 0, "vreg": 0}
    for fam in red.fams:
        w = max(fam.blk[1] - fam.blk[0], 1)
        for k in range(fam.l):
            g_rem = fam.g - k
            rows = fam.nG * g_rem
            # pivot metric + select (~6 ops over the group rows) and the
            # complex rank-1 update over (rows, w) window columns
            elim = acc(elim, ew(rows, 6),
                       {"flops": 8 * rows * w, "mxu": 0,
                        "vreg": 8 * -(-rows // 8) * max(1, w // 1) * lane_tiles // 4})
    for s, runs, lo in red.red_steps:
        nc = sum(hi - lo_r for lo_r, hi in runs)
        w = width - lo
        elim = acc(elim, ew(max(nc, 1), 6),
                   {"flops": 8 * nc * w, "mxu": 0,
                    "vreg": 8 * -(-max(nc, 1) // 8) * lane_tiles})

    # ---- backsub: n saved-row dot recoveries ---------------------------
    back = {"flops": 8 * n * n // 2 + 6 * n, "mxu": 0,
            "vreg": n * 6 * max(1, T // 128)}

    # ---- assemble one step ---------------------------------------------
    ci = args.corrector_iters
    n_evals = 4 + ci
    per_eval = acc(ev_mm, ev_ew, elim, back)
    step = acc(scale(per_eval, n_evals), scale(fill_rk, 3), fill_co)

    print(f"Per-path per-HC-step useful work (classic eval, reduced solve, "
          f"{n_evals:.1f} evals = 4 RK + {ci:.1f} corrector; tile={T}):")
    for name, d, mult in [
        ("evaluation matmuls", ev_mm, n_evals),
        ("evaluation elementwise", ev_ew, n_evals),
        ("P-cache fills", acc(scale(fill_rk, 3), fill_co), 1),
        ("elimination", elim, n_evals),
        ("backsub", back, n_evals),
        ("TOTAL", step, 1),
    ]:
        d = scale(d, mult)
        print(f"  {name:24s} {d['flops']/1e3:9.1f} kFLOP   "
              f"mxu-passes {d['mxu']:7.0f}   vreg-ops {d['vreg']:8.0f}")
    print("\nsplit3 note: every constant matmul executes as 3 one-pass bf16 "
          "products\n(exact f32 split), so EXECUTED MXU passes = 3x the "
          "column above.\nsplit3k (shipped default): the 3 split terms "
          "concatenate along K, so each\nconstant matmul ISSUES once -- "
          "issued MXU calls = the column above; the\nexecuted pass work "
          "is unchanged (3x K per call).")

    if args.step_us:
        per_path_us = args.step_us / T
        fl = step["flops"]
        rate = fl / (per_path_us * 1e-6)          # FLOP/s across the core
        print(f"\nAt measured step = {args.step_us} us/iter/tile (tile={T}):")
        print(f"  per-path step time    {per_path_us * 1e3:8.2f} ns")
        print(f"  useful work           {fl/1e3:8.1f} kFLOP/path/step")
        print(f"  achieved useful rate  {rate/1e9:8.2f} GFLOP/s")
        print(f"  v5e MXU peak 197 TFLOP/s bf16 ->  "
              f"{rate/197e12*100:6.3f} % of peak")
        tot_issue = step["vreg"] + 3 * step["mxu"]
        cyc = args.step_us * 940   # 940 MHz core clock -> cycles per step
        print(f"  issued ops/step: ~{step['vreg']:.0f} vreg + "
              f"{3*step['mxu']:.0f} bf16 MXU passes = {tot_issue:.0f}; "
              f"step budget {cyc:.0f} cycles -> "
              f"{cyc/tot_issue:4.1f} cycles/issued-op")
        print("  => issue/latency-bound: the binding resource is op count, "
              "not flops or bytes.")


if __name__ == "__main__":
    main()
