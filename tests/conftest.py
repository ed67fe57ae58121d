"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding paths compile and run without TPU hardware (SURVEY.md section 4)."""

import os

# Force the CPU backend for tests even when a TPU platform is configured in
# the environment; the driver/bench run on the real chip instead. jax may
# already be imported (sitecustomize pre-registers a TPU backend), so set the
# config directly as well as the env vars.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402

from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (  # noqa: E402
    EngineConfig,
)


@pytest.fixture(scope="session")
def cfg() -> EngineConfig:
    return EngineConfig()


@pytest.fixture(scope="session")
def problem(cfg):
    from trifocal_pose_estimation_using_improved_gpuhc_tpu.models.trifocal import (
        TrifocalProblem,
    )

    return TrifocalProblem.load(cfg)
