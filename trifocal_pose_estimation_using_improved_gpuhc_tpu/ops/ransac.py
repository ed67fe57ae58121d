"""RANSAC engine: hypothesis sampling, target-parameter construction, and
reprojection-inlier scoring of candidate trifocal poses.

Re-design of the reference's host sampling (GPU_HC_Solver.cpp:252-306), the
on-device solution evaluator (dev-trifocal_2op1p-eval.cuh:28-250), and the
host maximal-support selection (Evaluations.cpp:382-504), as vectorised JAX:
scoring is one (num_solutions x num_edgels) broadcast instead of per-thread
round loops.

Depth/reprojection math (identical in the reference's device and host paths,
util.hpp:169-209): for a correspondence (g1, g2) in metric image coordinates
and relative pose (R, T),

  rho   = (T_z * (R^T g2)_z - (R^T T)_z) / (1 - (R g1)_z * (R^T g2)_z)
  p     = rho * R g1 + T            (projected point, up to the global scale)
  error = || K(p/p_z) - K(g2) ||_px ,  inlier iff error < 2 px.

The expression is invariant to the scale of T, so raw (device path) and
normalised (host path) translations score identically.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sample_edgel_triplets(
    seed: int, num_edgels: int, num_hypotheses: int
) -> np.ndarray:
    """Pick 3 distinct edgel indices per hypothesis, deterministically.

    Matches the reference's seeding *philosophy* (srand(round_index) with
    FEED_RANDOM_SEED=false, GPU_HC_Solver.cpp:257-261): same seed => same
    samples. Uses numpy's PCG instead of C rand(); full 3-way distinctness
    (the reference's check misses the (0,2) pair, GPU_HC_Solver.cpp:270 --
    a latent bug we do not replicate).
    """
    rng = np.random.default_rng(seed)
    out = np.empty((num_hypotheses, 3), dtype=np.int64)
    for h in range(num_hypotheses):
        while True:
            s = rng.integers(0, num_edgels, size=3)
            if s[0] != s[1] and s[0] != s[2] and s[1] != s[2]:
                break
        out[h] = s
    return out


class GlibcRand:
    """Bit-exact reimplementation of glibc's rand() (TYPE_3 additive
    feedback generator, degree 31, separation 3), so the reference's
    srand(seed)-based RANSAC sampling (GPU_HC_Solver.cpp:257-271) can be
    reproduced EXACTLY for statistical reconciliation.  Validated against
    a compiled glibc program (tests/test_engine.py golden values)."""

    def __init__(self, seed: int):
        seed = seed if seed != 0 else 1
        r = [0] * 34
        r[0] = seed & 0xFFFFFFFF
        for i in range(1, 31):
            # r[i] = 16807 * r[i-1] % 2147483647 via Schrage to avoid
            # overflow, as glibc does.
            hi, lo = divmod(r[i - 1], 127773)
            word = 16807 * lo - 2836 * hi
            if word < 0:
                word += 2147483647
            r[i] = word
        for i in range(31, 34):
            r[i] = r[i - 31]
        self._r = r
        self._idx = 34
        for _ in range(34, 344):  # discard the first 310 outputs
            self._next()

    def _next(self) -> int:
        r = self._r
        v = (r[-31] + r[-3]) & 0xFFFFFFFF
        r.append(v)
        if len(r) > 64:
            del r[:-31]
        return v >> 1

    def rand(self) -> int:
        return self._next()


def sample_edgel_triplets_reference(
    seed: int, num_edgels: int, num_hypotheses: int
) -> np.ndarray:
    """The reference's EXACT sampling: glibc srand(seed) + rand() % N with
    its (buggy) duplicate check that never compares indices 0 and 2
    (GPU_HC_Solver.cpp:268-271 tests (e0!=e1 && e0!=e1 && e1!=e2)).
    Used only for statistical reconciliation against the committed sample
    outputs; production sampling is sample_edgel_triplets."""
    rng = GlibcRand(seed)
    out = np.empty((num_hypotheses, 3), dtype=np.int64)
    for h in range(num_hypotheses):
        while True:
            s = [rng.rand() % num_edgels for _ in range(3)]
            if s[0] != s[1] and s[1] != s[2]:  # e0 == e2 allowed (ref bug)
                break
        out[h] = s
    return out


def build_target_params(
    edge_locations: np.ndarray,
    edge_tangents: np.ndarray,
    samples: np.ndarray,
) -> np.ndarray:
    """Triplet edgels -> target parameters, (H, 34) complex64.

    Layout (GPU_HC_Solver.cpp:276-292): params[0:18] = locations of the 3
    sampled edgels (6 each), params[18:30] = tangents of the first 2 sampled
    edgels, params[30:33] = (1.0, 0.5, 1.0), params[33] = 1 (constant slot).
    """
    H = samples.shape[0]
    tgt = np.zeros((H, 34), dtype=np.complex64)
    tgt[:, 0:6] = edge_locations[samples[:, 0]]
    tgt[:, 6:12] = edge_locations[samples[:, 1]]
    tgt[:, 12:18] = edge_locations[samples[:, 2]]
    tgt[:, 18:24] = edge_tangents[samples[:, 0]]
    tgt[:, 24:30] = edge_tangents[samples[:, 1]]
    tgt[:, 30] = 1.0
    tgt[:, 31] = 0.5
    tgt[:, 32] = 1.0
    tgt[:, 33] = 1.0
    return tgt


def _pair_inliers(
    r: jnp.ndarray,   # (S, 3, 3)
    t: jnp.ndarray,   # (S, 3)
    g1: jnp.ndarray,  # (N, 2) metric coords in view 1
    g2: jnp.ndarray,  # (N, 2) metric coords in the other view
    k: jnp.ndarray,   # (3, 3) intrinsics
    thresh_px: float,
) -> jnp.ndarray:
    """Inlier counts (S,) for one view pair."""
    # (R^T g2)_z = column 3 of R dotted with homogeneous g2.
    rtg2 = r[:, 0, 2, None] * g2[None, :, 0] + r[:, 1, 2, None] * g2[None, :, 1] + r[:, 2, 2, None]
    rtt = r[:, 0, 2] * t[:, 0] + r[:, 1, 2] * t[:, 1] + r[:, 2, 2] * t[:, 2]  # (S,)
    rho_num = t[:, 2, None] * rtg2 - rtt[:, None]  # (S, N)
    rg1_z = r[:, 2, 0, None] * g1[None, :, 0] + r[:, 2, 1, None] * g1[None, :, 1] + r[:, 2, 2, None]
    rho_den = 1.0 - rg1_z * rtg2
    rg1_x = r[:, 0, 0, None] * g1[None, :, 0] + r[:, 0, 1, None] * g1[None, :, 1] + r[:, 0, 2, None]
    rg1_y = r[:, 1, 0, None] * g1[None, :, 0] + r[:, 1, 1, None] * g1[None, :, 1] + r[:, 1, 2, None]
    pz = rho_num * rg1_z + rho_den * t[:, 2, None]
    px = (rho_num * rg1_x + rho_den * t[:, 0, None]) / pz
    py = (rho_num * rg1_y + rho_den * t[:, 1, None]) / pz
    ex = (px - g2[None, :, 0]) * k[0, 0]
    ey = (py - g2[None, :, 1]) * k[1, 1]
    err = jnp.sqrt(ex * ex + ey * ey)
    return jnp.sum(err < thresh_px, axis=1)


def count_inlier_support(
    r21: jnp.ndarray,
    r31: jnp.ndarray,
    t21: jnp.ndarray,
    t31: jnp.ndarray,
    edge_locations: jnp.ndarray,  # (N, 6)
    intrinsics: jnp.ndarray,      # (3, 3)
    thresh_px: float = 2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reprojection-inlier counts for both view pairs, (S,) each.

    Vectorised equivalent of the per-warp edgel rounds in
    dev-trifocal_2op1p-eval.cuh:105-231 / the host loop Evaluations.cpp:427-455.
    """
    g1 = edge_locations[:, 0:2]
    g2 = edge_locations[:, 2:4]
    g3 = edge_locations[:, 4:6]
    n21 = _pair_inliers(r21, t21, g1, g2, intrinsics, thresh_px)
    n31 = _pair_inliers(r31, t31, g1, g3, intrinsics, thresh_px)
    return n21, n31


count_inlier_support_jit = jax.jit(count_inlier_support, static_argnames=("thresh_px",))
