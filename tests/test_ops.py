"""Pallas kernel tests (interpret mode on CPU) against the XLA oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from bayesian_cbf_tpu.ops import fused_gram_kb, fused_gram_kb_reference


def test_fused_gram_matches_oracle():
    rng = np.random.default_rng(0)
    K, n, mh = 19, 3, 3
    Xs = jnp.asarray(rng.normal(size=(K, n)), jnp.float32)
    UHB = jnp.asarray(rng.normal(size=(K, mh)), jnp.float32)
    mask = jnp.asarray((rng.uniform(size=K) > 0.3).astype(np.float32))
    got = fused_gram_kb(Xs, UHB, mask, 1.7, 1e-6, interpret=True)
    want = fused_gram_kb_reference(Xs, UHB, mask, 1.7, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fused_gram_psd_on_valid_block():
    rng = np.random.default_rng(1)
    K = 32
    Xs = jnp.asarray(rng.normal(size=(K, 3)), jnp.float32)
    UHB = jnp.asarray(rng.normal(size=(K, 3)), jnp.float32)
    mask = jnp.ones((K,), jnp.float32)
    Kb = np.asarray(fused_gram_kb(Xs, UHB, mask, 1.0, 1e-5, interpret=True))
    w = np.linalg.eigvalsh(Kb)
    assert w.min() > -1e-4


def test_chol_with_inv_custom_vjp_matches_autodiff():
    """chol_with_inv's matmul-only VJP must equal autodiff through
    cholesky + triangular solve exactly."""
    import numpy as np
    from bayesian_cbf_tpu.ops.cholinv import chol_with_inv
    rng = np.random.default_rng(0)
    n = 9
    A = rng.normal(size=(n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    W1 = jnp.asarray(rng.normal(size=(n, n)))
    W2 = jnp.asarray(rng.normal(size=(n, n)))

    def f_custom(K):
        L, Linv = chol_with_inv(K)
        return (jnp.sum(W1 * L) + jnp.sum(W2 * Linv)
                + jnp.sum(jnp.log(jnp.diagonal(L))))

    def f_ref(K):
        L = jnp.linalg.cholesky(K)
        Linv = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=K.dtype), lower=True)
        return (jnp.sum(W1 * L) + jnp.sum(W2 * Linv)
                + jnp.sum(jnp.log(jnp.diagonal(L))))

    np.testing.assert_allclose(np.asarray(jax.grad(f_custom)(K)),
                               np.asarray(jax.grad(f_ref)(K)),
                               rtol=1e-12, atol=1e-12)
    Kb = jnp.stack([K, 1.3 * K + jnp.eye(n)])
    np.testing.assert_allclose(np.asarray(jax.vmap(jax.grad(f_custom))(Kb)),
                               np.asarray(jax.vmap(jax.grad(f_ref))(Kb)),
                               rtol=1e-12, atol=1e-12)


def test_pallas_chol_with_inv_interpret_matches_lapack():
    """Blocked Pallas factorization kernel (interpret mode): factor and
    inverse match LAPACK across pad-boundary sizes."""
    import numpy as np
    from bayesian_cbf_tpu.ops.pallas_chol import batched_chol_with_inv
    rng = np.random.default_rng(0)
    for B, n in [(3, 200), (5, 60), (2, 256), (2, 300)]:
        A = rng.normal(size=(B, n, n)).astype(np.float32)
        K = jnp.asarray(A @ np.swapaxes(A, 1, 2)
                        + n * np.eye(n, dtype=np.float32))
        L, Linv = batched_chol_with_inv(K, interpret=True)
        Lref = np.linalg.cholesky(np.asarray(K, np.float64))
        rel = (np.max(np.abs(np.asarray(L) - Lref))
               / np.max(np.abs(Lref)))
        assert rel < 5e-5, (B, n, rel)
        recon = np.asarray(Linv, np.float64) @ np.asarray(L, np.float64)
        assert np.max(np.abs(recon - np.eye(n))) < 5e-4, (B, n)


def test_chol_with_inv_vmap_dispatch_grad():
    """custom_vmap + custom_vjp composition: vmapped gradients through
    chol_with_inv equal autodiff through the XLA reference."""
    import numpy as np
    from bayesian_cbf_tpu.ops import cholinv
    rng = np.random.default_rng(1)
    n = 11
    A = rng.normal(size=(4, n, n))
    K = jnp.asarray(A @ np.swapaxes(A, 1, 2) + n * np.eye(n))
    W = jnp.asarray(rng.normal(size=(n, n)))

    def f(Ki):
        L, Linv = cholinv.chol_with_inv(Ki)
        return jnp.sum(W * L) + jnp.sum(W * Linv)

    def fref(Ki):
        L = jnp.linalg.cholesky(Ki)
        Linv = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=Ki.dtype), lower=True)
        return jnp.sum(W * L) + jnp.sum(W * Linv)

    g = jax.jit(jax.vmap(jax.grad(f)))(K)
    gref = jax.vmap(jax.grad(fref))(K)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref),
                               rtol=1e-11, atol=1e-12)


def test_solve_and_logdet_matches_autodiff():
    """Fused (K^{-1} Y, logdet) custom VJP == direct autodiff through
    cholesky-based formulas (f64)."""
    import jax
    from bayesian_cbf_tpu.ops.cholinv import solve_and_logdet
    rng = np.random.default_rng(7)
    n, m = 12, 3
    B = rng.normal(size=(n, n))
    K = jnp.asarray(B @ B.T + n * np.eye(n))
    Y = jnp.asarray(rng.normal(size=(n, m)))

    def fused(K, Y):
        S, ld = solve_and_logdet(K, Y)
        return jnp.sum(S * jnp.arange(1.0, m + 1)) + 0.7 * ld

    def direct(K, Y):
        S = jnp.linalg.solve(K, Y)
        sign, ld = jnp.linalg.slogdet(K)
        return jnp.sum(S * jnp.arange(1.0, m + 1)) + 0.7 * ld

    np.testing.assert_allclose(float(fused(K, Y)), float(direct(K, Y)),
                               rtol=1e-10)
    gK1, gY1 = jax.grad(fused, argnums=(0, 1))(K, Y)
    gK2, gY2 = jax.grad(direct, argnums=(0, 1))(K, Y)
    np.testing.assert_allclose(np.asarray(gY1), np.asarray(gY2), atol=1e-10)
    # the fused op returns the unconstrained cotangent; autodiff through
    # jnp.linalg.solve does too, so they agree elementwise
    np.testing.assert_allclose(np.asarray(gK1), np.asarray(gK2), atol=1e-9)


def test_sweep_kernel_interpret_matches_oracle():
    """Recursive Schur/sweep inversion kernel (interpret mode) ==
    (inv, slogdet) at the flagship shape class."""
    from bayesian_cbf_tpu.ops.pallas_sweep import batched_kinv_logdet
    rng = np.random.default_rng(3)
    for B, n in [(3, 200), (2, 33), (1, 32)]:
        A = rng.normal(size=(B, n, n))
        K = jnp.asarray(A @ np.swapaxes(A, 1, 2) + n * np.eye(n),
                        jnp.float64)
        Kinv, ld = batched_kinv_logdet(K, interpret=True)
        # kernel is f32 internally
        np.testing.assert_allclose(np.asarray(Kinv),
                                   np.linalg.inv(np.asarray(K)),
                                   atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(ld), np.linalg.slogdet(np.asarray(K))[1],
            rtol=2e-5)


def test_fused_gram_accurate_for_near_duplicate_points():
    """Same regression pin as models/mvgp.py k_xx, for the fused Gram
    kernel: consecutive-state clouds must not lose d^2 accuracy to
    dot-form cancellation (the kernel accumulates exact per-dimension
    differences)."""
    from bayesian_cbf_tpu.ops.gram import fused_gram_kb
    rng = np.random.default_rng(0)
    base = np.array([2.0, -1.5, 0.7])
    X = base + np.cumsum(0.001 * rng.normal(size=(40, 3)), axis=0)
    UHB = rng.normal(size=(40, 3))
    mask = np.ones(40)
    got = fused_gram_kb(jnp.asarray(X, jnp.float32),
                        jnp.asarray(UHB, jnp.float32),
                        jnp.asarray(mask, jnp.float32),
                        1.3, 1e-6, interpret=True)
    # f64 truth via the exact difference form
    d = X[:, None, :] - X[None, :, :]
    rbf = 1.3 * np.exp(-0.5 * (d ** 2).sum(-1))
    ref = rbf * (UHB @ UHB.T) + 1e-6 * np.eye(40)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-5)


def test_kinv_logdet_nested_vmap_collapses_batch_dims(monkeypatch):
    """ADVICE r2: a nested vmap hands the custom-vmap rule a >3-D K; the
    rule must collapse leading dims before the kernel call (which only
    accepts (B, n, n)) and restore them after."""
    from bayesian_cbf_tpu.ops import cholinv
    seen = {}

    def fake_kernel(K, interpret=False):
        seen["shape"] = K.shape
        assert K.ndim == 3, K.shape
        return cholinv._kinv_logdet_ref(K)

    monkeypatch.setattr(cholinv, "USE_PALLAS", True)
    monkeypatch.setattr(cholinv, "batched_kinv_logdet_fit", fake_kernel)
    rng = np.random.default_rng(0)
    n = 7
    A = rng.normal(size=(2, 3, n, n))
    K = jnp.asarray(A @ np.swapaxes(A, -1, -2) + n * np.eye(n))
    Kinv, ld = jax.vmap(jax.vmap(cholinv.kinv_logdet))(K)
    # the rule fires per vmap level (innermost first), so the kernel must
    # have been handed exactly 3-D input (the fake kernel asserts ndim==3)
    assert len(seen["shape"]) == 3
    np.testing.assert_allclose(np.asarray(Kinv), np.linalg.inv(np.asarray(K)),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(ld),
                               np.linalg.slogdet(np.asarray(K))[1],
                               rtol=1e-10)


def test_kinv_logdet_unbatched_operand_under_vmap():
    """vmap over an unrelated arg with K closed over (in_batched False):
    the rule must not assume K carries a batch dim."""
    from bayesian_cbf_tpu.ops import cholinv
    rng = np.random.default_rng(1)
    n = 5
    A = rng.normal(size=(n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n))

    def f(scale):
        Kinv, ld = cholinv.kinv_logdet(K)
        return scale * ld

    out = jax.vmap(f)(jnp.arange(1.0, 4.0))
    want = np.arange(1.0, 4.0) * np.linalg.slogdet(np.asarray(K))[1]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-10)




def test_cholsolve_kernels_interpret():
    """The round-5 factor+solve kernel pair (measured dead end at the
    flagship shape — records hutchinson_solve_kernel_negative — but kept
    correct): forward factor+solve+logdet and the sweeps-only backward
    both match the XLA oracle in interpret mode."""
    from bayesian_cbf_tpu.ops.pallas_chol import (
        batched_cholsolve_logdet, batched_solve_with_factor)
    rng = np.random.default_rng(3)
    B, n, r = 3, 50, 11
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    K = jnp.asarray(A @ np.swapaxes(A, 1, 2)
                    + 0.5 * np.eye(n, dtype=np.float32))
    RHS = jnp.asarray(rng.normal(size=(B, n, r)).astype(np.float32))
    sol, L, Dinv, ld = batched_cholsolve_logdet(K, RHS, interpret=True,
                                                nb=16)
    ref = jnp.linalg.solve(K, RHS)
    np.testing.assert_allclose(np.asarray(sol), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    _, ld_ref = jnp.linalg.slogdet(K)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_ref),
                               rtol=1e-5, atol=1e-4)
    sol2 = batched_solve_with_factor(L, Dinv, RHS[:, :, :3],
                                     interpret=True, nb=16)
    np.testing.assert_allclose(np.asarray(sol2), np.asarray(ref[:, :, :3]),
                               rtol=2e-4, atol=2e-4)
