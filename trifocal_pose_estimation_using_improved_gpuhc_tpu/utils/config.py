"""Typed configuration for the HC solver and RANSAC engine.

Collapses the reference's two config tiers -- per-problem YAML
(/root/reference/problems/trifocal_2op1p_30x30/gpuhc_settings.yaml) and
compile-time macros (/root/reference/magmaHC/definitions.hpp:5-44) -- into one
runtime-typed config. Nothing here requires recompilation: everything is a
jit-static dataclass field.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

# Default dataset root: the mounted reference tree holds the problem data and
# the synthcurves RANSAC dataset. Override with TPUHC_DATA_ROOT.
DEFAULT_DATA_ROOT = os.environ.get("TPUHC_DATA_ROOT", "/root/reference")


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """Static problem dimensions (reference gpuhc_settings.yaml:16-25)."""

    name: str = "trifocal_2op1p_30x30"
    num_vars: int = 30
    num_params: int = 33
    num_tracks: int = 312
    hx_max_terms: int = 8
    hx_max_parts: int = 5
    ht_max_terms: int = 16
    ht_max_parts: int = 6
    max_order_of_t: int = 2
    num_coeffs_from_params: int = 37  # used by the P2C ablation variant


@dataclasses.dataclass(frozen=True)
class HCConfig:
    """Path-tracker hyper-parameters (reference gpuhc_settings.yaml:12-14 and
    kernel constants in kernel_GPUHC_trifocal_2op1p_30x30_PH_CodeOpt_TrunPaths.cu)."""

    max_steps: int = 80                 # GPUHC_Max_Steps
    # GPUHC_Max_Correction_Steps; env override TPUHC_MCS (campaign
    # tooling: CJR replays extra iterations nearly for free, so A/Bs
    # pair TPUHC_CJR=k with TPUHC_MCS=k+1..).
    max_correction_steps: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get("TPUHC_MCS", "3")))
    steps_to_increase_delta_t: int = 4  # GPUHC_Num_Of_Steps_to_Increase_Delta_t
    init_delta_t: float = 0.01          # kernel ...TrunPaths.cu:79 (delta_t = 0.01)
    end_zone_factor: float = 0.0500001  # ...TrunPaths.cu:147 (end-zone radius)
    t_converged_eps: float = 1e-7       # convergence test 1-t <= 1e-7 (:283)
    corrector_tol_sq: float = 1e-6      # ||dx||^2 < 1e-6 ||x||^2 (:241)
    infinity_norm_sq: float = 1e14      # ||x||^2 > 1e14 -> infinity fail (:242)
    truncate_paths: bool = True         # TrunPaths: depth-sign pruning (:149-154)
    # Optimisation knobs beyond the reference (ablation ladder additions):
    compact_survivors: bool = True      # compact active paths between segments
    # HC steps per fused-kernel segment: compaction/scoring runs between
    # segments, so shorter segments prune finer but launch more often.
    # Semantics-invariant (pure scheduling; step counts/flags identical),
    # so retunes are timing-only A/Bs.  Env override TPUHC_SEGMENT_STEPS
    # (campaign tooling: bench A/B after per-step cost changes).
    segment_steps: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get(
            "TPUHC_SEGMENT_STEPS", "8")))
    # (RKJ) frozen-Jacobian RK stages: evaluate/factor Hx once per HC step,
    # re-apply the factorization to stages 2-4's -Ht right-hand sides. The
    # corrector still uses the exact Jacobian, so converged roots satisfy
    # the same tolerance; only predictor quality (and hence step counts /
    # convergence statistics) can shift. Our strategy beyond the
    # reference's four (README.md:5); validated against the exact-RK4 mode.
    rk_jacobian_reuse: bool = False
    # Predictor order ("rk4" | "rk3" | "rk2"): the reference always runs
    # classic RK4 (...TrunPaths.cu:170-211).  Each stage below RK4
    # removes one full evaluate+factor+solve from every HC step (the
    # dominant per-step cost), at the price of a lower-order prediction
    # (RK3: Kutta's third-order; RK2: midpoint) -- the Newton corrector
    # still polishes to the same tolerance, so accepted roots are
    # identical; only corrector failure rates / dt adaptation / conv
    # stats can shift.  Gate adoption on convergence statistics like
    # every step-semantics change.  Env override TPUHC_PREDICTOR.
    predictor: str = dataclasses.field(
        default_factory=lambda: os.environ.get("TPUHC_PREDICTOR", "rk4"))
    # (CJR) modified-Newton corrector: run k full Newton iterations
    # (evaluate + factor Hx), then re-apply the LAST full iteration's
    # factorization to later iterations' H right-hand sides
    # (ops/fused._resolve_rhs / _reduce_resolve_rhs) -- no Hx gather,
    # no assembly, no forward elimination on those.  0 disables (all
    # iterations full Newton, the reference semantics).  Unlike the
    # rejected frozen-Jacobian RK stages (which bias the PREDICTION and
    # collapsed convergence 2394 -> 277), this only slows the
    # corrector's contraction from quadratic to linear on the SAME
    # fixed point H(x, t_c) = 0 -- accepted roots satisfy the identical
    # tolerance; only whether a path passes it within
    # max_correction_steps (hence step counts / conv stats) can shift.
    # MEASURED (CPU oracle, view 0, H=16): k=1 degrades badly (conv
    # 1634 -> 1196, inf 1048 -> 2188 trun-off) -- the first iterate's
    # Jacobian diverges marginal paths; k=2 replays only the final
    # iteration with a near-converged Jacobian.  Gate adoption on
    # convergence statistics.  Env override TPUHC_CJR=<k> for campaign
    # A/B without code edits.
    corrector_jacobian_reuse: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get("TPUHC_CJR", "0")))
    # (CPH) corrector->predictor factorization handoff: when EVERY lane
    # of a tile that was active in the previous HC step advanced (no
    # corrector rollback), the next step's RK stage 1 evaluates only
    # -Ht and replays the corrector's saved factorization instead of a
    # fresh Hx gather + assembly + forward elimination.  Stage 1 then
    # runs with a Jacobian whose staleness is the FINAL Newton update of
    # the previous step (||dx|| < 1e-3 ||x|| by the corrector's success
    # test) evaluated at the SAME t -- orders of magnitude tighter than
    # the rejected frozen-Jacobian RK stages (staleness ~ dt*k1, conv
    # 2394 -> 277) or CJR=1 (first-iterate distance, conv -27%).  The
    # handoff condition is tile-granular in the kernel (the oracle
    # applies it batch-wide; parity tests use one tile).  History:
    # adopted in round 4 on a step A/B (82.30 vs 84.39 us/iter/tile,
    # reconcile gate held, bench 58014 vs 57707) measured PRE-split3k;
    # REVERTED in round 5 at the split3k defaults by the interleaved
    # engine-level bench arms of campaign 18c (defaults 486.65/487.13/
    # 486.91 ms vs CPH=0 479.57/490.61*/481.03; *pre-outage outlier):
    # under split3k the per-corrector-iteration factorization saves cost
    # more than the ~28%-of-steps stage-1 replay win.  OFF is the
    # reference's exact semantics (fresh Jacobian every stage,
    # ...TrunPaths.cu:170-211); TPUHC_CPH=1 re-enables the handoff.
    predictor_handoff: bool = dataclasses.field(
        default_factory=lambda: bool(int(os.environ.get("TPUHC_CPH", "0"))))
    # Evaluator matmul mode on TPU: "split3" computes every constant matmul
    # as three 1-pass bf16 products of an exact f32 = hi+lo1+lo2 split
    # (exact to f32 final rounding, ~2x faster than Precision.HIGHEST,
    # which Mosaic lowers to ~6 bf16 passes); "split3k" issues each
    # matmul ONCE with the three split terms concatenated along K
    # (5 matmul calls per evaluation instead of 15 -- per-call overhead
    # dominates at these shapes; the h+l1+l2 association moves into the
    # MXU K-accumulation, ~1-ulp class).  "split3k" ADOPTED as default
    # in round 4 (campaign 13, v5e, tile=128): eval core 4.83 -> 3.93
    # us/iter/tile, full HC step 81.71 -> 71.34 (-12.7%), reconcile
    # gates held (trun-off conv 10716 / real 671 / inf 6589 vs defaults
    # 10678/670/6582; trun-on 2541/118/1940 vs 2540/118/1938), bench
    # 57.8k -> 64.2k paths/s (vs_baseline 0.277 -> 0.308); tile=256
    # retune check stayed worse (159.10), tile default remains 128.
    # TPUHC_EVAL_PRECISION=split3 restores the 15-call form.
    # "split3_rk2" additionally
    # drops the RK PREDICTOR stages to 2-term splits (~16 significant
    # bits; the Newton corrector keeps the exact 3-term form) -- gate any
    # adoption on convergence statistics; "highest" is the plain
    # HIGHEST-precision path.  Interpret mode always uses plain f32.
    # Env override TPUHC_EVAL_PRECISION (campaign tooling: A/B "highest"
    # vs "split3" when chasing imaginary-residue questions on hardware).
    eval_precision: str = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "TPUHC_EVAL_PRECISION", "split3k"))
    # Hoisted pair-product quadratic basis ("abc" | "efg").  "abc" expands
    # P_q(t) = (s_a + t d_a)(s_b + t d_b) = A t^2 + B t + C (A = d d,
    # B = s d + d s, C = s s) -- the round-2 hoisting.  Its evaluation
    # error is ~eps * max(|A|,|B|,|C|) ABSOLUTE, which for the many small
    # pair products (median |P| ~ 0.01, coefficients O(1)) is a 1e-5..1e-3
    # RELATIVE error near t = 1 -- measured to put a ~1e-4 floor under
    # every converged solution's imaginary residue (the fused kernel
    # reports 31 'real' solutions at the reference's 1e-4 cliff where the
    # direct-form oracle reports 659; identical in interpret mode, so it
    # is formulation, not TPU arithmetic).  "efg" hoists the TWO-POINT
    # form P = t^2 E + t(1-t) F + (1-t)^2 G (E = tgt tgt, F = tgt s +
    # s tgt, G = s s): exact at t = 1 (E is a product of exact target
    # data) and t = 0, matching the oracle's p(t) = t*tgt + (1-t)*s
    # (compute_param_homotopy, ...LimUnroll_L2Cache.cuh:40-54).
    # ADOPTED as default in round 4 -- every gate improved on v5e:
    # reconcile real 31 -> 669 at the 1e-4 cliff (oracle 659, reference
    # CPU 521) with conv/inf held, accuracy sweep 92/100 recovered (90
    # on the first round, up from 89), serving median 292 -> 213 ms,
    # bench unchanged (57.9k), step +2.7% (before the 3-op broadcast-row
    # fill).  Env override TPUHC_PAIR_BASIS=abc restores the round-2/3
    # basis for A/B.
    pair_coef_basis: str = dataclasses.field(
        default_factory=lambda: os.environ.get("TPUHC_PAIR_BASIS", "efg"))
    # Evaluator op structure ("classic" | "gathered" | "merged"):
    # "classic" issues the original 5 constant matmuls per evaluation;
    # "gathered" merges the two combo gathers into one (4 matmuls,
    # ops/fused._eval_core_gathered); "merged" also fuses the hx/rhs
    # folds into one block-diagonal matmul (3 matmuls,
    # ops/fused._eval_core_merged).  Both are algebraically identical to
    # classic but differ at the ~1-ulp level (XLA re-fuses/contracts
    # restructured graphs differently), so adopting either is gated on
    # convergence statistics like an eval-precision change.  The bet for
    # both: fewer op issues beat extra zero MXU tiles on v5e (the eval
    # phase is issue-bound).  Default stays "classic" until the new
    # paths' Mosaic compile + step time + conv stats are measured on
    # hardware (a tunnel outage blocked that in round 3); A/B via
    # tools/microbench_fused.py --classic/--gathered/--merged and
    # phases evals/evalg/evalm/evalk.  TPUHC_EVAL_STRUCTURE overrides the
    # default (campaign tooling: lets reconcile_stats.py / bench.py A/B a
    # structure without touching code).
    eval_structure: str = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "TPUHC_EVAL_STRUCTURE", "classic"))
    # Tracker backend: "fused" = Pallas fused kernel (ops/fused.py, the
    # production path), "xla" = plain-JAX masked while_loop (ops/tracker.py,
    # the oracle / CPU-HC equivalent).
    backend: str = "fused"
    # 30x30 solve inside the fused kernel: "reduced" = condensed group
    # elimination (ops/reduce.py: batched family stages + compacted 14x16
    # reduced system -- same pivots/arithmetic as the full schedule with
    # dead rows removed); "schedule" = the 30-stage static schedule
    # (required by rk_jacobian_reuse, and the fallback when a problem's
    # pattern has no kernel-supported condensation).
    # Env override TPUHC_SOLVER (campaign tooling: required by the
    # factorization-saving strategies until the reduced path learns to
    # save/replay -- see _solve's assert).
    solver: str = dataclasses.field(
        default_factory=lambda: os.environ.get("TPUHC_SOLVER", "reduced"))
    # Fused-kernel paths per grid tile.  Per-path kernel cost is flat from
    # 256 down to 128 (microbench), but END-TO-END rounds are ~10% faster
    # at 128 (556 -> 498 ms at H=100 on v5e): whole-tile early exit
    # retires straggler tiles at finer granularity.  512 is ~20% worse
    # per path.  64 is structurally UNSUPPORTED on TPU (campaign 19
    # probe): paths ride the lane axis and Mosaic requires lane-dim block
    # sizes divisible by 128, so sub-128 tiles fail lowering -- and would
    # waste half the vector lanes even if they lowered.  The kernel
    # caller raises a clear error; interpret-mode tests/dryruns use
    # small tiles freely.  Tile size is timing-only (tile-wide corrector
    # skip / early exit never change per-path results -- done lanes are
    # frozen), so tile A/Bs are bench-level, no conv gate needed.
    # Env override TPUHC_TILE.
    tile: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get("TPUHC_TILE", "128")))


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """RANSAC loop settings (reference definitions.hpp:12-19 and yaml:28-31)."""

    num_iterations: int = 100            # NUM_OF_RANSAC_ITERATIONS
    imag_part_tol: float = 1e-5          # IMAG_PART_TOL
    rot_residual_tol: float = 1e-1       # ROT_RESIDUAL_TOL
    transl_residual_tol: float = 1e-1    # TRANSL_RESIDUAL_TOL
    reproj_inlier_thresh_px: float = 2.0  # REPROJ_ERROR_INLIER_THRESH
    pass_inlier_support_ratio: float = 0.90  # PASS_RANSAC_INLIER_SUPPORT_RATIO
    abort_by_good_sol: bool = False      # Abort_RANSAC_by_Good_Sol (yaml:28)
    # Hypotheses tracked per launch under abort mode. The reference's abort
    # saves time because CUDA serialises excess blocks, so late blocks see
    # the flag before doing work (...TrunRANSAC.cu:152); the TPU analogue
    # is explicit: hypotheses run in chunks and remaining chunks are
    # skipped once a chunk reports a >=90%-support pose.
    # Round-2 tune picked 4 (115 ms to pose vs 139 at 8); the round-5
    # retune at the final split3k kernel INVERTED it -- per-path tracking
    # got ~40% faster while the ~24 ms/chunk d2h read stayed constant,
    # and larger chunks cut the worst case (fewer sequential launches
    # when the first passing hypothesis is late).  Campaign 21
    # (interleaved 100-view sweeps): chunk 8 median 176/177 ms, mean
    # 323/326, p90 433/460 vs chunk 4's 203/203, 450/445, 1612/1691.
    # Campaign 21b (8/12/16 interleaved x2): 12 wins both reps on
    # median AND mean (188.2/192.8, ~302, p90 ~375) vs 8 and 16; the
    # per-view MIN rises with chunk (115 -> 146 -> 175 ms, more hyps
    # tracked before the first read) but median/mean/p90 all favor 12.
    # Env override TPUHC_ABORT_CHUNK (campaign tooling: the stream-abort
    # throughput optimum differs -- see stream_abort_chunk).
    abort_chunk: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get("TPUHC_ABORT_CHUNK",
                                                   "12")))
    # Hypotheses per chunk in the STREAM abort pipeline
    # (engine._run_stream_abort).  The stream-throughput optimum differs
    # from abort_chunk's single-round latency optimum: campaign 18d
    # (v5e, 12 views x H=100) measured 5.66 views/s at chunk 4, 9.32 at
    # 8, 8.48 at 16 -- the ~24 ms tunnelled d2h read per chunk dominates
    # at small chunks, excess tracked work at large ones.  Default moved
    # 8 -> 10 in round 5 (campaigns 20/20b/20c, final defaults + tail
    # warmup): on the FULL 100-view dataset -- whose 11 unfound views
    # sweep every chunk exhaustively -- chunk=10 won both interleaved
    # reps (6.87/6.97 views/s vs 6.55/6.16 at 8); all-found 12-view
    # windows read 8 and 10 within noise of each other (7.57 vs 7.42).
    # Env override TPUHC_STREAM_CHUNK.
    stream_abort_chunk: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get("TPUHC_STREAM_CHUNK",
                                                   "10")))
    feed_random_seed: bool = False       # FEED_RANDOM_SEED: false => seed = round idx
    test_ransac_times: int = 1           # TEST_RANSAC_TIMES
    dataset: str = "Synthetic"           # RANSAC_Dataset (yaml:31)
    zero_imag_part_tol: float = 1e-4     # ZERO_IMAG_PART_TOL_FOR_SP (real-sol count)
    duplicate_sol_tol: float = 1e-4      # DUPLICATE_SOL_DIFF_TOL (unique-sol dedup)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    problem: ProblemConfig = ProblemConfig()
    hc: HCConfig = HCConfig()
    ransac: RansacConfig = RansacConfig()
    data_root: str = DEFAULT_DATA_ROOT
    output_dir: str = "Output_Write_Files"
    num_devices: Optional[int] = None  # None = all visible devices
    # Num_Of_Cores (gpuhc_settings.yaml:34): the reference pins its CPU-HC
    # OpenMP thread count (CPU_HC_Solver.cpp); here the CPU oracle is a
    # single jitted XLA program whose thread pool is managed by the XLA CPU
    # runtime, so the key is parsed for config parity and recorded, but the
    # degree of parallelism is XLA's. None = "not set in the YAML".
    num_cpu_cores: Optional[int] = None


def problem_dir(cfg: EngineConfig) -> str:
    return os.path.join(cfg.data_root, "problems", cfg.problem.name)


def ransac_data_dir(cfg: EngineConfig) -> str:
    return os.path.join(
        cfg.data_root, "RANSAC_Data", cfg.problem.name, cfg.ransac.dataset
    )


def load_problem_yaml(path: str) -> EngineConfig:
    """Load a reference-format gpuhc_settings.yaml into an EngineConfig.

    Accepts the exact key set of the reference YAML
    (problems/trifocal_2op1p_30x30/gpuhc_settings.yaml:5-34) so existing
    problem folders work unmodified.
    """
    import yaml

    with open(path) as f:
        text = f.read()
    # The reference files start with the OpenCV-style "%YAML:1.0" directive,
    # which PyYAML rejects; strip any %-directives.
    lines = [ln for ln in text.splitlines() if not ln.startswith("%")]
    doc = yaml.safe_load("\n".join(lines)) or {}

    prob = ProblemConfig(
        name=doc.get("problem_name", "trifocal_2op1p_30x30"),
        num_vars=int(doc.get("Num_Of_Vars", 30)),
        num_params=int(doc.get("Num_Of_Params", 33)),
        num_tracks=int(doc.get("Num_Of_Tracks", 312)),
        hx_max_terms=int(doc.get("dHdx_Max_Terms", 8)),
        hx_max_parts=int(doc.get("dHdx_Max_Parts", 5)),
        ht_max_terms=int(doc.get("dHdt_Max_Terms", 16)),
        ht_max_parts=int(doc.get("dHdt_Max_Parts", 6)),
        max_order_of_t=int(doc.get("Max_Order_Of_T", 2)),
        num_coeffs_from_params=int(doc.get("Num_Of_Coeffs_From_Params", 37)),
    )
    hc = HCConfig(
        max_steps=int(doc.get("GPUHC_Max_Steps", 80)),
        max_correction_steps=int(doc.get("GPUHC_Max_Correction_Steps", 3)),
        steps_to_increase_delta_t=int(
            doc.get("GPUHC_Num_Of_Steps_to_Increase_Delta_t", 4)
        ),
    )
    ransac = RansacConfig(
        abort_by_good_sol=bool(doc.get("Abort_RANSAC_by_Good_Sol", False)),
        dataset=str(doc.get("RANSAC_Dataset", "Synthetic")),
    )
    # Num_Of_GPUs (gpuhc_settings.yaml:9) maps to the hypothesis-mesh device
    # count (parallel/mesh.py); 1 keeps the single-chip path.
    ndev = int(doc.get("Num_Of_GPUs", 1))
    cores = doc.get("Num_Of_Cores")
    return EngineConfig(
        problem=prob, hc=hc, ransac=ransac,
        num_devices=ndev if ndev > 1 else None,
        num_cpu_cores=int(cores) if cores is not None else None,
    )
