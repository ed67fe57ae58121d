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


def main():
    # The tunnelled TPU runtime occasionally wedges for 15-45 min (even a
    # trivial op hangs); retry with patience before shrinking the
    # workload so a transient outage doesn't zero the benchmark.
    attempts = [(100, 0), (100, 600), (32, 300), (32, 600)]
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
        print(json.dumps({"metric": "HC paths/sec/chip", "value": 0.0,
                          "unit": "paths/s", "vs_baseline": 0.0}))
        return 1
    print(json.dumps({
        "metric": "HC paths/sec/chip",
        "value": round(paths_per_sec, 1),
        "unit": "paths/s",
        "vs_baseline": round(paths_per_sec / BASELINE_PATHS_PER_SEC, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
