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
