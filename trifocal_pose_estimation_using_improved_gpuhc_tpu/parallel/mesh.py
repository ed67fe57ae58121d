"""Hypothesis-axis data parallelism over a TPU device mesh.

The reference shards RANSAC iterations statically across <= 8 GPUs with zero
inter-GPU communication and host-side result stacking
(GPU_HC_Solver.cpp:84-88, 494-506). The TPU-native equivalent: a 1-D
``jax.sharding.Mesh`` over a "hyp" axis and ``shard_map`` of the whole
path-tracking program -- each device owns a contiguous block of hypotheses
(all 312 paths of a hypothesis stay on one device, the 30-var system is never
split), runs its own masked while_loop, and *exits independently* when its
local paths finish, like reference GPU blocks retiring early.

Backends:

* ``"segmented"`` -- the production path: the fused Pallas kernel driven by
  ops/segmented.py per shard.  Tracking itself is communication-free; with
  TrunRANSAC abort the found-flag is all-reduced (max) across the mesh at
  every segment boundary and the best pose is chosen by all_gather+argmax
  (see ops/segmented.py) -- stronger than the reference, whose abort flag
  never crosses GPUs (...TrunRANSAC.cu:152, SURVEY.md section 2.4).
* ``"fused"`` -- the fused Pallas kernel, single whole-budget launch per
  shard, zero communication.
* ``"xla"`` -- the plain-JAX oracle tracker per shard (CPU-mesh dry runs).

Multi-host: the same mesh spans hosts via jax.distributed; hypothesis blocks
ride ICI within a slice, and the only DCN traffic is the per-segment scalar
found-flag all-reduce in abort mode.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from trifocal_pose_estimation_using_improved_gpuhc_tpu.models.trifocal import (
    TrifocalProblem,
)
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import linalg, tracker
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops.tracker import (
    TrackResult,
)
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
    HCConfig,
    RansacConfig,
)


def make_mesh(n_devices: Optional[int] = None, axis: str = "hyp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_sharded_track_fn(
    problem: TrifocalProblem,
    cfg: HCConfig,
    mesh: Mesh,
    axis: str = "hyp",
    solve=linalg.solve_batched,
    backend: str = "xla",
    interpret: bool = False,
    ransac_cfg: Optional[RansacConfig] = None,
    tile: int = 256,
):
    """Build the multi-chip tracking function.

    Returned fn(x0 (B, V) c64-as-host-numpy, target_params (B, P+1),
    diff_params (B, P+1)) -> TrackResult, with B = hypotheses x tracks and
    the batch dim sharded over the mesh axis. B must divide evenly by the
    mesh size (pad hypotheses to a multiple of the device count).

    backend "segmented" runs the production Pallas kernel per shard via the
    segmented driver (compaction + cross-chip TrunRANSAC when ransac_cfg
    enables abort); "fused" runs the plain fused kernel per shard; "xla"
    runs the plain-JAX oracle tracker.  ``track.jitted`` mirrors the
    single-chip contract of the chosen backend.
    """
    spec = P(axis)
    if backend == "segmented":
        from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import (
            segmented,
        )

        seg_track = segmented.make_segmented_track_fn(
            problem, cfg, ransac_cfg, tile=tile, interpret=interpret,
            axis_name=axis,
        )
        sharded = jax.shard_map(
            seg_track.jitted,
            mesh=mesh,
            in_specs=(spec,) * 6 + (P(), P(), P()),
            out_specs=(spec,) * 6 + (P(), P(), P(), P()),
            check_vma=False,
        )
        jitted = jax.jit(sharded)

        def track(x0, target_params, diff_params, edgels=None,
                  intrinsics=None, n_edgels=None) -> segmented.SegmentedResult:
            x0 = np.asarray(x0)
            tgt = np.asarray(target_params)
            diff = np.asarray(diff_params)
            f32 = np.float32
            if edgels is None:
                edgels = np.full((8, 6), 1e3, f32)
                intrinsics = np.eye(3, dtype=f32)
                n_edgels = 8
            out = jitted(
                x0.real.astype(f32), x0.imag.astype(f32),
                tgt.real.astype(f32), tgt.imag.astype(f32),
                diff.real.astype(f32), diff.imag.astype(f32),
                np.asarray(edgels, f32), np.asarray(intrinsics, f32),
                np.float32(n_edgels if n_edgels is not None else len(edgels)),
            )
            (xr, xi, conv, inf, pruned, steps,
             found, found_path, best_supp, best_path) = out
            x = np.asarray(xr) + 1j * np.asarray(xi)
            return segmented.SegmentedResult(
                track=TrackResult(
                    x=x.astype(np.complex64),
                    converged=np.asarray(conv),
                    inf_fail=np.asarray(inf),
                    pruned=np.asarray(pruned),
                    num_steps=np.asarray(steps),
                ),
                found=bool(np.asarray(found)),
                found_path=int(np.asarray(found_path)),
                best_support=int(np.asarray(best_supp)),
                best_path=int(np.asarray(best_path)),
            )

        track.jitted = jitted
        track.constants = seg_track.constants
        return track

    if backend == "fused":
        from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import (
            fused,
        )

        fused_track = fused.make_track_fn(
            problem, cfg, tile=tile, interpret=interpret
        )

        def _local_track(*planes):
            return fused_track.jitted(*planes)
    else:
        step_fn = tracker.make_step_fn(problem, cfg, solve)

        def _local_track(x0_re, x0_im, tgt_re, tgt_im, diff_re, diff_im):
            # Runs per device on its hypothesis block; local early exit.
            x0 = jax.lax.complex(x0_re, x0_im)
            tgt = jax.lax.complex(tgt_re, tgt_im)
            diff = jax.lax.complex(diff_re, diff_im)
            s0 = tracker.init_state(x0, cfg)

            if cfg.predictor_handoff:
                # CPH (HCConfig.predictor_handoff): thread the saved
                # corrector factorization + shard-wide handoff flag, as
                # in tracker.make_track_fn.  Per-SHARD granularity here
                # (each device's block decides independently), mirroring
                # the kernel's per-tile condition.
                nv = x0.shape[1]
                extras0 = (
                    jnp.zeros((x0.shape[0], nv, nv), x0.dtype),
                    jnp.zeros((), bool),
                )

                def cond(c):
                    return (c[0].step <= cfg.max_steps) & jnp.any(
                        tracker._active(c[0], cfg)
                    )

                def body(c):
                    return step_fn(c[0], tgt, diff, c[1])

                s = jax.lax.while_loop(cond, body, (s0, extras0))[0]
                return (
                    jnp.real(s.x),
                    jnp.imag(s.x),
                    tracker._is_converged(s.t, cfg),
                    s.inf_fail,
                    s.pruned,
                    s.num_steps,
                )

            def cond(s):
                return (s.step <= cfg.max_steps) & jnp.any(
                    tracker._active(s, cfg)
                )

            def body(s):
                return step_fn(s, tgt, diff)

            s = jax.lax.while_loop(cond, body, s0)
            return (
                jnp.real(s.x),
                jnp.imag(s.x),
                tracker._is_converged(s.t, cfg),
                s.inf_fail,
                s.pruned,
                s.num_steps,
            )

    sharded = jax.shard_map(
        _local_track,
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=(spec,) * 6,
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def track(x0, target_params, diff_params) -> tracker.TrackResult:
        x0 = np.asarray(x0)
        tgt = np.asarray(target_params)
        diff = np.asarray(diff_params)
        f32 = np.float32
        xr, xi, conv, inf, pruned, steps = jitted(
            x0.real.astype(f32), x0.imag.astype(f32),
            tgt.real.astype(f32), tgt.imag.astype(f32),
            diff.real.astype(f32), diff.imag.astype(f32),
        )
        x = np.asarray(xr) + 1j * np.asarray(xi)
        return tracker.TrackResult(
            x=x.astype(np.complex64),
            converged=np.asarray(conv),
            inf_fail=np.asarray(inf),
            pruned=np.asarray(pruned),
            num_steps=np.asarray(steps),
        )

    track.jitted = jitted
    return track
