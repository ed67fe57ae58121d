"""Monodromy start-system generation, powered by the framework's own tracker.

The reference regenerates its start system offline with Julia's
HomotopyContinuation.jl ``monodromy_solve``
(problems/trifocal_2op1p_30x30/trifocal_2op1p_30x30_monodromySolve.jl:1-94).
This module is the native equivalent: given a seed parameter point p0 with a
(possibly partial) set of known solutions, it discovers the remaining
solutions of the 312-path trifocal system by tracking monodromy loops
p0 -> p1 -> p2 -> p0 through random complex parameter points with the
production HC tracker (ops/fused.py, ``dynamic_start=True``).  Solutions
permute around each loop; landing points that are not already known are new
roots.  The loop repeats until the solution count closes (no growth for
``patience`` consecutive loops) or ``target_count`` is reached.

This closes the data-plane loop: the framework can regenerate
``start_sols.txt`` / ``start_params.txt`` (D4 in SURVEY.md section 2.2)
rather than only consuming the shipped files.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from trifocal_pose_estimation_using_improved_gpuhc_tpu.models.trifocal import (
    TrifocalProblem,
)
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
    HCConfig,
)


@dataclasses.dataclass
class MonodromyResult:
    params: np.ndarray      # (P+1,) complex64 seed parameter point
    solutions: np.ndarray   # (N, V) complex64 distinct roots at params
    loops_run: int
    history: list           # solution count after each loop


def make_refiner(problem: TrifocalProblem, batch: int, iters: int = 3):
    """Newton-polish roots at a fixed parameter point (plain XLA, planes).

    Returns refine(x (B,V) complex64, params (P+1,)) -> (x_refined,
    residual_inf (B,)).  Keeps monodromy landing points honest: tracked
    roots carry end-zone error, and duplicates only collapse under the
    dedup tolerance once polished.
    """
    import jax
    import jax.numpy as jnp

    from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import (
        eval as ev,
        linalg,
    )

    @jax.jit
    def _refine(xr, xi, pr, pi):
        x = jax.lax.complex(xr, xi)
        p = jnp.broadcast_to(jax.lax.complex(pr, pi), x.shape[:1] + pr.shape)
        for _ in range(iters):
            hx, h, _ = ev.eval_all_factored(
                problem, x, p, p, need_h=True, need_ht=False
            )
            x = x - linalg.solve_batched(hx, h)
        _, h, _ = ev.eval_all_factored(
            problem, x, p, p, need_h=True, need_ht=False
        )
        res = jnp.max(jnp.abs(jnp.real(h)) + jnp.abs(jnp.imag(h)), axis=1)
        return jnp.real(x), jnp.imag(x), res

    def refine(x: np.ndarray, params: np.ndarray):
        B = x.shape[0]
        Bp = -(-B // batch) * batch
        if Bp != B:
            x = np.concatenate(
                [x, np.broadcast_to(x[:1], (Bp - B,) + x.shape[1:])]
            )
        f32 = np.float32
        xr, xi, res = _refine(
            x.real.astype(f32), x.imag.astype(f32),
            params.real.astype(f32), params.imag.astype(f32),
        )
        out = np.asarray(xr) + 1j * np.asarray(xi)
        return out[:B].astype(np.complex64), np.asarray(res)[:B]

    return refine


def _dedup(sols: np.ndarray, new: np.ndarray, tol: float) -> np.ndarray:
    """Append rows of ``new`` not already present in ``sols``.

    Relative inf-norm distance (duplicate-solution test of
    Evaluations.cpp:184-233 with a scale-aware tolerance)."""
    out = sols
    for row in new:
        if out.size == 0:
            out = row[None]
            continue
        scale = max(1.0, float(np.abs(row).max()))
        if np.min(np.max(np.abs(out - row[None]), axis=1)) > tol * scale:
            out = np.concatenate([out, row[None]])
    return out


def monodromy_solve(
    problem: TrifocalProblem,
    cfg: HCConfig,
    seed_sols: Optional[np.ndarray] = None,
    target_count: Optional[int] = None,
    max_loops: int = 30,
    patience: int = 3,
    rng_seed: int = 0,
    dedup_tol: float = 1e-3,
    perturb_scale: float = 1.0,
    track_fn=None,
    interpret: bool = False,
    leg_batch: Optional[int] = None,
) -> MonodromyResult:
    """Grow a solution set at the problem's start parameters via monodromy.

    seed_sols: initial known roots at problem.start_params (defaults to the
    shipped start solutions -- pass a subset to exercise real discovery).
    track_fn: a ``track(x0, tgt, diff)`` built with ``dynamic_start=True``
    (defaults to the fused tracker; pass the oracle for CPU tests).
    """
    p0 = np.asarray(problem.start_params).astype(np.complex64)
    npar = p0.shape[0] - 1  # last slot is the constant 1
    if seed_sols is None:
        seed_sols = np.asarray(problem.start_sols)
    sols = np.asarray(seed_sols, np.complex64).copy()
    if target_count is None:
        target_count = problem.num_tracks

    if track_fn is None:
        from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import (
            fused,
        )

        # Depth-sign pruning is a RANSAC heuristic (real geometry); at
        # random complex parameter points every root is complex, so
        # monodromy legs must track untruncated.
        cfg = dataclasses.replace(cfg, truncate_paths=False)
        track_fn = fused.make_track_fn(
            problem, cfg, interpret=interpret, dynamic_start=True
        )

    rng = np.random.default_rng(rng_seed)
    history = []
    stagnant = 0
    loops = 0
    refiner = None
    residual_tol = 1e-3

    # Fixed leg batch size: one compiled program serves every loop even as
    # the solution set grows (pad by repeating the first root).
    if leg_batch is None:
        leg_batch = max(target_count, problem.num_tracks)

    def leg(x_from: np.ndarray, p_from: np.ndarray, p_to: np.ndarray):
        B = x_from.shape[0]
        Bp = -(-B // leg_batch) * leg_batch
        if Bp != B:
            x_from = np.concatenate(
                [x_from, np.broadcast_to(x_from[:1], (Bp - B,) + x_from.shape[1:])]
            )
        tgt = np.broadcast_to(p_to, (Bp, p0.shape[0])).astype(np.complex64)
        diff = (p_to - p_from)[None].repeat(Bp, axis=0).astype(np.complex64)
        res = track_fn(x_from, tgt, diff)
        return res.x[:B], res.converged[:B]

    for loops in range(1, max_loops + 1):
        # Random complex waypoints around the seed point (the monodromy
        # group acts transitively on the 312 trifocal roots).
        way = []
        for _ in range(2):
            z = p0.copy()
            z[:npar] = z[:npar] + perturb_scale * (
                rng.standard_normal(npar) + 1j * rng.standard_normal(npar)
            ).astype(np.complex64)
            way.append(z)

        x, ok = leg(sols, p0, way[0])
        x, ok2 = leg(x, way[0], way[1])
        x, ok3 = leg(x, way[1], p0)
        good = ok & ok2 & ok3
        # Newton-polish the landing points at p0 and accept only true
        # roots; unpolished end-zone error defeats duplicate detection.
        if refiner is None:
            refiner = make_refiner(problem, batch=leg_batch)
        cand, res = refiner(x[good], p0)
        cand = cand[res < residual_tol]
        before = sols.shape[0]
        sols = _dedup(sols, cand, dedup_tol)
        history.append(int(sols.shape[0]))
        if sols.shape[0] == before:
            stagnant += 1
        else:
            stagnant = 0
        if sols.shape[0] >= target_count or stagnant >= patience:
            break

    return MonodromyResult(
        params=p0, solutions=sols, loops_run=loops, history=history
    )


def write_start_system(
    path_params: str, path_sols: str, result: MonodromyResult
) -> None:
    """Write start_params.txt / start_sols.txt in the reference format:
    one "re im" pair per line, num_params lines / num_tracks*num_vars lines
    (Data_Reader.cpp:37-60,104-121; utils/data_io.py round-trips them)."""
    with open(path_params, "w") as f:
        for z in result.params[:-1]:  # constant-1 slot is implicit
            f.write(f"{z.real:.17g}\t{z.imag:.17g}\n")
    with open(path_sols, "w") as f:
        for row in result.solutions:
            for z in row:
                f.write(f"{z.real:.17g}\t{z.imag:.17g}\n")


def main(argv=None) -> int:
    """Regenerate the start system: python -m ...models.monodromy [--seeds N]."""
    import argparse

    from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
        EngineConfig,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, default=None,
                    help="use only the first N shipped roots as seeds "
                         "(default: all -- verifies closure)")
    ap.add_argument("--max-loops", type=int, default=30)
    ap.add_argument("--rng-seed", type=int, default=0)
    ap.add_argument("--out-dir", default=None,
                    help="write start_params.txt / start_sols.txt here")
    args = ap.parse_args(argv)

    cfg = EngineConfig()
    problem = TrifocalProblem.load(cfg)
    seeds = None
    if args.seeds is not None:
        seeds = np.asarray(problem.start_sols)[: args.seeds]
    res = monodromy_solve(
        problem, cfg.hc, seed_sols=seeds, max_loops=args.max_loops,
        rng_seed=args.rng_seed,
    )
    print(f"monodromy: {res.loops_run} loops, growth {res.history}")
    print(f"solutions: {res.solutions.shape[0]} / {problem.num_tracks}")
    if args.out_dir:
        import os

        os.makedirs(args.out_dir, exist_ok=True)
        write_start_system(
            os.path.join(args.out_dir, "start_params.txt"),
            os.path.join(args.out_dir, "start_sols.txt"),
            res,
        )
        print(f"wrote start system to {args.out_dir}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
