"""Tests for the batched pivoted complex solver."""

import jax.numpy as jnp
import numpy as np

from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import linalg


def test_solve_matches_numpy():
    rng = np.random.default_rng(1)
    B, N = 16, 30
    a = (rng.standard_normal((B, N, N)) + 1j * rng.standard_normal((B, N, N))).astype(
        np.complex64
    )
    b = (rng.standard_normal((B, N)) + 1j * rng.standard_normal((B, N))).astype(
        np.complex64
    )
    x = np.asarray(linalg.solve_batched(jnp.asarray(a), jnp.asarray(b)))
    ref = np.linalg.solve(a.astype(np.complex128), b.astype(np.complex128)[..., None])[..., 0]
    np.testing.assert_allclose(x, ref.astype(np.complex64), rtol=2e-3, atol=2e-4)


def test_solve_needs_pivoting():
    # Zero on the leading diagonal forces a row swap.
    a = np.array(
        [[[0.0, 1.0], [1.0, 0.0]], [[1e-8, 1.0], [1.0, 1.0]]], dtype=np.complex64
    )
    b = np.array([[2.0, 3.0], [1.0, 2.0]], dtype=np.complex64)
    x = np.asarray(linalg.solve_batched(jnp.asarray(a), jnp.asarray(b)))
    ref = np.linalg.solve(a.astype(np.complex128), b.astype(np.complex128)[..., None])[..., 0]
    np.testing.assert_allclose(x, ref.astype(np.complex64), rtol=1e-4, atol=1e-5)


def test_singular_returns_finite():
    a = np.zeros((2, 4, 4), dtype=np.complex64)
    b = np.ones((2, 4), dtype=np.complex64)
    x = np.asarray(linalg.solve_batched(jnp.asarray(a), jnp.asarray(b)))
    assert np.isfinite(x).all()
