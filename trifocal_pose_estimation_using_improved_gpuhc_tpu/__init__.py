"""TPU-native homotopy-continuation minimal-solver engine for trifocal pose estimation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the GPU-HC++
reference (C-H-Chien/Trifocal_Pose_Estimation_using_Improved_GPUHC): a batched
complex predictor-corrector path tracker for the trifocal 2op1p 30x30 polynomial
system, embedded in a RANSAC loop for SLAM tracking-loss recovery, scaled over
TPU meshes with jax.sharding.

Layering (bottom-up):
  ops/      - evaluators (H, Hx, Ht), batched complex linear solves, the HC
              path tracker, Pallas kernels, RANSAC scoring.
  models/   - minimal-problem definitions (trifocal 2op1p 30x30) compiled to
              device-ready constants.
  parallel/ - hypothesis-axis sharding over a device mesh, early-abort
              collectives, multi-host scale-out.
  utils/    - config, data IO, host-side evaluation/metrics, output writers.
"""

__version__ = "0.1.0"

from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (  # noqa: F401
    EngineConfig,
    HCConfig,
    ProblemConfig,
    RansacConfig,
    load_problem_yaml,
)


def __getattr__(name):
    # Lazy: importing the engine pulls in jax; keep bare package import light.
    if name == "TrifocalPoseEngine":
        from trifocal_pose_estimation_using_improved_gpuhc_tpu.engine import (
            TrifocalPoseEngine,
        )

        return TrifocalPoseEngine
    raise AttributeError(name)
