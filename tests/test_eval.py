"""Golden tests for the homotopy evaluators.

Validates the decoded index-table semantics against mathematical ground truth:
H(start_sols, t=0) = 0 (the start system is solved by the start solutions),
Hx = dH/dx and -Ht = -dH/dt via jax autodiff, and the factored (MXU) evaluator
against the direct (oracle) one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trifocal_pose_estimation_using_improved_gpuhc_tpu.models.trifocal import (
    pad_params,
)
from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import eval as ev


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _random_targets(problem, rng, n):
    # Random complex perturbations of the start params as fake targets.
    base = np.asarray(problem.start_params)
    tgt = base[None, :] + 0.3 * (
        rng.standard_normal((n, base.shape[0]))
        + 1j * rng.standard_normal((n, base.shape[0]))
    ).astype(np.complex64)
    tgt[:, -1] = 1.0  # constant slot
    return jnp.asarray(tgt)


def test_start_system_solves_to_zero(problem):
    x0 = problem.start_sols  # (312, 30)
    p0 = jnp.broadcast_to(problem.start_params, (x0.shape[0],) + problem.start_params.shape)
    h = ev.eval_H_direct(problem, x0, p0)
    assert jnp.max(jnp.abs(h)) < 5e-4  # complex64 roundoff on O(1) terms


def test_hx_matches_autodiff(problem, rng):
    x = problem.start_sols[:4] + 0.1 * jnp.asarray(
        rng.standard_normal((4, 30)) + 1j * rng.standard_normal((4, 30)),
        dtype=jnp.complex64,
    )
    p = _random_targets(problem, rng, 4)

    def h_single(xi, pi):
        return ev.eval_H_direct(problem, xi[None], pi[None])[0]

    jac = jax.vmap(jax.jacfwd(h_single, argnums=0, holomorphic=True))(x, p)
    hx = ev.eval_Hx_direct(problem, x, p)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(hx), rtol=2e-3, atol=2e-3)


def test_minus_ht_matches_autodiff(problem, rng):
    x = problem.start_sols[:4]
    tgt = _random_targets(problem, rng, 4)
    diff = tgt - problem.start_params
    t = jnp.asarray([0.1, 0.4, 0.7, 0.95], jnp.float32)

    def h_of_t(ti, xi, tgti):
        pi = ev.param_homotopy(ti[None], problem.start_params, tgti[None])
        return ev.eval_H_direct(problem, xi[None], pi)[0]

    # d/dt via complex-step-free finite difference in float64-ish tolerance.
    eps = 1e-3
    fd = jax.vmap(
        lambda ti, xi, tgti: (h_of_t(ti + eps, xi, tgti) - h_of_t(ti - eps, xi, tgti))
        / (2 * eps)
    )(t, x, tgt)
    p = ev.param_homotopy(t, problem.start_params, tgt)
    mht = ev.eval_minus_Ht_direct(problem, x, p, diff)
    np.testing.assert_allclose(np.asarray(-fd), np.asarray(mht), rtol=5e-2, atol=5e-3)


def test_factored_matches_direct(problem, rng):
    n = 8
    x = problem.start_sols[:n] + 0.05 * jnp.asarray(
        rng.standard_normal((n, 30)) + 1j * rng.standard_normal((n, 30)),
        dtype=jnp.complex64,
    )
    tgt = _random_targets(problem, rng, n)
    diff = tgt - problem.start_params
    t = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
    p = ev.param_homotopy(t, problem.start_params, tgt)

    hx_f, h_f, mht_f = ev.eval_all_factored(problem, x, p, diff)
    hx_d = ev.eval_Hx_direct(problem, x, p)
    h_d = ev.eval_H_direct(problem, x, p)
    mht_d = ev.eval_minus_Ht_direct(problem, x, p, diff)

    np.testing.assert_allclose(np.asarray(hx_f), np.asarray(hx_d), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_d), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mht_f), np.asarray(mht_d), rtol=1e-4, atol=1e-4)


def test_factored_structure_counts(problem):
    f = problem.factored
    # Structure facts measured from the reference tables (SURVEY.md 2.2-D2).
    assert f.hx_C.shape[1] == 170  # nonzero Hx entries of 900
    assert len(f.qm_a) == 47       # distinct quadratic monomials
    assert len(f.cm_a) == 115      # distinct cubic monomials
    assert len(f.pp_a) == 38       # distinct parameter pairs
    assert f.hx_C.shape[0] == 288  # distinct (pair, quad) combos


def test_efg_pair_basis_endpoint_exact(problem, rng):
    """pair_coef_basis="efg" (HCConfig): the hoisted two-point quadratic
    P = t^2 E + t(1-t) F + (1-t)^2 G, evaluated with the per-lane basis
    rows (t^2, tv, v^2), must reproduce the TARGET pair products
    BIT-EXACTLY at t = 1 and the START pair products at t = 0 -- the
    endpoint-exactness that removed the kernel's ~1e-4 imaginary-residue
    floor (README reconciliation section).  The legacy "abc" basis has
    no such guarantee (its error is absolute in the coefficient scale).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    from trifocal_pose_estimation_using_improved_gpuhc_tpu.ops import fused

    f = problem.factored
    pa, pb = np.asarray(f.pp_a), np.asarray(f.pp_b)
    B = 5
    tgt = (rng.standard_normal((B, len(problem.start_params)))
           + 1j * rng.standard_normal((B, len(problem.start_params)))
           ).astype(np.complex64)
    diff = (tgt - problem.start_params).astype(np.complex64)
    er, ei, fr, fi, gr, gi = [np.asarray(a) for a in fused.build_pair_coefs(
        problem, diff.real, diff.imag, B, tgt.real, tgt.imag,
        basis="efg", dynamic_start=False,
    )]

    def fill(t):
        t = np.float32(t)
        v = np.float32(1.0) - t
        tt, tv, vv = t * t, t * v, v * v
        return (tt * er + (tv * fr + vv * gr),
                tt * ei + (tv * fi + vv * gi))

    # (a) The fill at the endpoints returns the STORED coefficient planes
    # bit-exactly: the basis rows (t^2, tv, v^2) are exactly (1, 0, 0) at
    # t = 1 and (0, 0, 1) at t = 0.
    pr1, pi1 = fill(1.0)
    np.testing.assert_array_equal(pr1, er)
    np.testing.assert_array_equal(pi1, ei)
    pr0, pi0 = fill(0.0)
    np.testing.assert_array_equal(pr0, gr)
    np.testing.assert_array_equal(pi0, gi)
    # (b) The stored E/G are single-rounded f32 products of exact data
    # (XLA-vs-numpy differ only in mul-add fusion, ~1 ulp).
    e_tgt = tgt[:, pa] * tgt[:, pb]
    np.testing.assert_allclose(pr1.T, e_tgt.real, rtol=0, atol=2e-6)
    np.testing.assert_allclose(pi1.T, e_tgt.imag, rtol=0, atol=2e-6)
    s = np.asarray(problem.start_params)
    e_s = (s[pa] * s[pb]).astype(np.complex64)
    np.testing.assert_allclose(
        pr0.T, np.broadcast_to(e_s.real, pr0.T.shape), rtol=0, atol=2e-6)
