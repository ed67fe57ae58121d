"""Multi-host mesh test: 2 REAL processes x 4 CPU devices each, connected
via jax.distributed -- the actual multi-process codepath (SURVEY.md
section 7.6's N-hosts rung), not the single-process virtual mesh used by
test_parallel.py.  Each worker drives make_sharded_track_fn over the
global 8-device mesh and checks its shard against the single-chip oracle,
plus a cross-process pmax (the abort-flag collective pattern)."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_mesh():
    nproc = 2
    coord = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 4 local devices per process (the conftest's 8 applies only in-proc).
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nproc), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "MULTIHOST_OK" in out, f"worker {i} output:\n{out}"
