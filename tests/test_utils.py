import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_cbf_tpu.utils import (kron, psd_cholesky, psd_clamp_eigh,
                                    masked_cholesky, affine_terms,
                                    quadratic_terms, normalize_radians)


def test_kron_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(3, 4))
    b = rng.normal(size=(2, 5))
    np.testing.assert_allclose(kron(jnp.array(a), jnp.array(b)),
                               np.kron(a, b), rtol=1e-12)


def test_psd_cholesky_recovers_pd():
    rng = np.random.default_rng(1)
    Q = rng.normal(size=(6, 6))
    K = Q @ Q.T + 1e-3 * np.eye(6)
    Kp, L = psd_cholesky(jnp.array(K))
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(Kp), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Kp), K, atol=1e-8)


def test_psd_cholesky_repairs_singular():
    # rank-deficient Gram from repeated data samples -- the failure mode the
    # reference's make_psd jitter ladder handles
    v = np.array([[1.0, 2.0, 3.0]])
    K = v.T @ v  # rank 1, singular
    Kp, L = psd_cholesky(jnp.array(K))
    assert np.all(np.isfinite(np.asarray(L)))
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(Kp), atol=1e-8)


def test_psd_clamp_eigh():
    K = jnp.array([[1.0, 0.0], [0.0, -1e-3]])
    Kc = psd_clamp_eigh(K)
    w = np.linalg.eigvalsh(np.asarray(Kc))
    assert w.min() >= -1e-12


def test_masked_cholesky_matches_subblock():
    rng = np.random.default_rng(2)
    Q = rng.normal(size=(5, 5))
    K = Q @ Q.T + 0.1 * np.eye(5)
    mask = jnp.array([1.0, 1.0, 0.0, 1.0, 0.0])
    _, L = masked_cholesky(jnp.array(K), mask, init_jitter=0.0)
    # solve with a rhs supported on valid rows equals the dense sub-solve
    rhs = np.zeros(5)
    rhs[[0, 1, 3]] = rng.normal(size=3)
    x = jax.scipy.linalg.cho_solve((L, True), jnp.array(rhs))
    sub = K[np.ix_([0, 1, 3], [0, 1, 3])]
    x_sub = np.linalg.solve(sub, rhs[[0, 1, 3]])
    np.testing.assert_allclose(np.asarray(x)[[0, 1, 3]], x_sub, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(x)[[2, 4]], 0.0, atol=1e-12)


def test_affine_terms():
    a_true = jnp.array([2.0, -3.0])
    f = lambda u: a_true @ u + 5.0
    a, b = affine_terms(f, jnp.array([0.7, 0.3]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_true), rtol=1e-12)
    np.testing.assert_allclose(float(b), 5.0, rtol=1e-12)


def test_quadratic_terms():
    Q_true = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    p_true = jnp.array([1.0, -1.0])
    f = lambda u: u @ Q_true @ u + p_true @ u + 4.0
    Q, p, r = quadratic_terms(f, jnp.array([0.2, -0.4]))
    np.testing.assert_allclose(np.asarray(Q), np.asarray(Q_true), atol=1e-10)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_true), atol=1e-10)
    np.testing.assert_allclose(float(r), 4.0, atol=1e-10)


def test_normalize_radians():
    np.testing.assert_allclose(float(normalize_radians(jnp.array(3 * np.pi / 2))),
                               -np.pi / 2, rtol=1e-9)


def test_chol_small_unrolled_matches_lapack():
    """Unrolled small-matrix Cholesky + solve == LAPACK on healthy PD
    inputs; finite (PSD-projected) on indefinite noise."""
    from bayesian_cbf_tpu.utils.linalg import (chol_small_unrolled,
                                               cho_solve_small_unrolled)
    rng = np.random.default_rng(0)
    for n in (2, 3, 6, 9):
        A = rng.normal(size=(4, n, n))
        K = jnp.asarray(A @ np.swapaxes(A, -1, -2) + n * np.eye(n))
        L = chol_small_unrolled(K)
        np.testing.assert_allclose(np.asarray(L),
                                   np.linalg.cholesky(np.asarray(K)),
                                   rtol=1e-10, atol=1e-12)
        B = jnp.asarray(rng.normal(size=(4, n, 5)))
        X = cho_solve_small_unrolled(L, B)
        np.testing.assert_allclose(np.asarray(K @ X), np.asarray(B),
                                   rtol=1e-8, atol=1e-10)
    # indefinite: pivot clamping keeps everything finite
    Kneg = jnp.asarray(np.diag([1.0, -0.5, 2.0]))
    L = chol_small_unrolled(Kneg)
    assert bool(jnp.all(jnp.isfinite(L)))
