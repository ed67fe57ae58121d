#!/usr/bin/env python
"""Benchmark: HC path-tracking throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference's committed sample run tracks
312 paths x 100 RANSAC hypotheses in 149.575 ms on its sample GPU
(= 2.086e5 HC paths/s/GPU; /root/reference/Output_Write_Files/GPU_Timings.txt,
BASELINE.md). vs_baseline = our paths/s / 2.086e5.
"""

import json
import sys
import time

BASELINE_PATHS_PER_SEC = 31200 / 0.149575  # reference sample run


def run(num_hypotheses: int):
    import numpy as np

    from trifocal_pose_estimation_using_improved_gpuhc_tpu.engine import (
        TrifocalPoseEngine,
    )
    from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
        EngineConfig,
    )

    cfg = EngineConfig()
    engine = TrifocalPoseEngine(cfg)
    view = engine.load_view(0)
    # Compile + warm up.
    engine.run_round(view, seed=0, num_hypotheses=num_hypotheses)
    # Timed runs (different seeds = different hypothesis samples, like
    # TEST_RANSAC_TIMES rounds in the reference driver).
    times = []
    for seed in range(3):
        rr = engine.run_round(view, seed=seed, num_hypotheses=num_hypotheses)
        times.append(rr.track_ms)
    best_ms = min(times)
    n_paths = num_hypotheses * engine.problem.num_tracks
    return n_paths / (best_ms / 1e3), best_ms, n_paths


def child_main():
    # One measurement attempt tier inside a supervised subprocess (the
    # parent kills us on a hang -- a wedged tunnel blocks inside a jax
    # call without raising, so in-process retries alone cannot recover).
    attempts = [(100, 0), (100, 300), (32, 120)]
    for H, wait in attempts:
        try:
            if wait:
                print(f"bench: waiting {wait}s for TPU runtime recovery",
                      file=sys.stderr)
                time.sleep(wait)
            paths_per_sec, best_ms, n_paths = run(H)
            break
        except Exception as e:  # TPU worker instability: wait / retry
            print(f"bench: H={H} failed ({type(e).__name__}), retrying",
                  file=sys.stderr)
    else:
        return 1
    print(json.dumps({
        "metric": "HC paths/sec/chip",
        "value": round(paths_per_sec, 1),
        "unit": "paths/s",
        "vs_baseline": round(paths_per_sec / BASELINE_PATHS_PER_SEC, 4),
        # Self-explaining extras: best round time over the 3 seeds and the
        # path count it covers (value = round_paths / round_ms * 1e3), so
        # future BENCH_r*.json can be reconciled against README tables
        # without re-running (VERDICT r3 item 6).
        "round_ms": round(best_ms, 2),
        "round_paths": n_paths,
    }))
    return 0


def main():
    """Supervisor: wait out tunnel outages, then measure in a child.

    The tunnelled TPU runtime wedges for 15-45 min routinely and 6+ HOURS
    occasionally (even jax.devices() hangs at backend init), so a fixed
    retry ladder can zero the benchmark.  The parent probes with a tiny
    subprocess (bounded by timeout, surviving full hangs), then runs the
    measurement in a killable child; it keeps trying until
    TPUHC_BENCH_PATIENCE_S (default 3 h) elapses.
    """
    import os
    import subprocess

    if os.environ.get("TPUHC_BENCH_CHILD"):
        return child_main()
    patience = float(os.environ.get("TPUHC_BENCH_PATIENCE_S", "10800"))
    deadline = time.time() + patience
    env = dict(os.environ, TPUHC_BENCH_CHILD="1")
    probe_src = ("import jax, jax.numpy as jnp, numpy as np; "
                 "print(np.asarray(jnp.ones((8, 8)).sum()))")
    first = True
    while first or time.time() < deadline:
        first = False
        try:
            subprocess.run([sys.executable, "-c", probe_src], timeout=240,
                           check=True, stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
        except Exception:
            print("bench: TPU probe failed; waiting out the outage",
                  file=sys.stderr)
            time.sleep(120)
            continue
        try:
            out = subprocess.run(
                [sys.executable, __file__], timeout=5400, env=env,
                stdout=subprocess.PIPE,
            )
        except subprocess.TimeoutExpired:
            print("bench: measurement child hung; restarting",
                  file=sys.stderr)
            continue
        lines = out.stdout.decode().strip().splitlines()
        if out.returncode == 0 and lines:
            print(lines[-1])
            return 0
        print("bench: measurement child failed; retrying", file=sys.stderr)
        time.sleep(60)
    print(json.dumps({"metric": "HC paths/sec/chip", "value": 0.0,
                      "unit": "paths/s", "vs_baseline": 0.0}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
