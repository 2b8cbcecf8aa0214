#!/usr/bin/env python
"""Generate tests/data/golden_posterior.npz — the stored-posterior parity
fixture (SURVEY.md section 4 test-plan item: compare the JAX posterior
mean/cov against an independently computed reference output).

The expected values are produced by a from-scratch pure-NumPy
implementation of the matrix-variate posterior algorithm the reference
uses (Rasmussen-Williams Alg. 2.1 with the scalarized kernel
kb(x,x';u,u') = k(x,x') u^T B u' and task matrix A — the math of
bayes_cbf/control_affine_model.py:983-1091), NOT by the code under test.
tests/test_f32_and_golden.py then asserts MVGP.predict_fullmat matches
both this oracle and the committed file.

Run from the repo root: JAX_PLATFORMS=cpu python scripts/make_golden_posterior.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0.0)


def numpy_mvgp_posterior(raw_ls, raw_os, W_A, raw_vA, W_B, raw_vB, mean_M,
                         X, UH, Xdot, Xtest, jitter, eps=None):
    """Independent oracle for the matrix-variate posterior (see module
    docstring).  Returns (mean (b(1+m)n,), var (b(1+m)n, b(1+m)n))."""
    ls = softplus(raw_ls)
    os_ = softplus(raw_os)
    A = W_A @ W_A.T + np.diag(softplus(raw_vA))
    B = W_B @ W_B.T + np.diag(softplus(raw_vB))

    def k(X1, X2):
        d = (X1[:, None, :] - X2[None, :, :]) / ls
        return os_ * np.exp(-0.5 * np.sum(d * d, -1))

    K = X.shape[0]
    b = Xtest.shape[0]
    mh = UH.shape[1]
    n = Xdot.shape[1]

    Kb = k(X, X) * (UH @ B @ UH.T)
    # mirror MVGP.gram_kb's dtype-aware nugget (round 3): jitter plus
    # 10 * k * eps * mean(diag) — `eps` is the epsilon of the dtype of
    # the PATH UNDER TEST (f64 here for the oracle check, f32 for the
    # fast-path fixture)
    if eps is None:
        eps = np.finfo(np.float64).eps
    scale = max(np.mean(np.abs(np.diag(Kb))), 1.0)
    Kb = Kb + (jitter + 10.0 * K * eps * scale) * np.eye(K)
    Y = Xdot - UH @ mean_M                       # (K, n) residuals
    alpha = np.linalg.solve(Kb, Y)               # (K, n)

    UB = UH @ B                                  # (K, 1+m)
    kb_star = k(Xtest, X)[:, :, None] * UB[None]  # (b, K, 1+m)

    meanFT = (np.broadcast_to(mean_M.T[None], (b, n, mh)).copy()
              + np.einsum('kn,bkj->bnj', alpha, kb_star))
    mean = meanFT.transpose(0, 2, 1).reshape(-1)

    Kss = k(Xtest, Xtest)
    Bk = Kss[:, :, None, None] * B[None, None]
    flat = kb_star.transpose(1, 0, 2).reshape(K, b * mh)
    solved = np.linalg.solve(Kb, flat).reshape(K, b, mh)
    Bk = Bk - np.einsum('bki,kcj->bcij', kb_star, solved)
    BkXX = Bk.transpose(0, 2, 1, 3).reshape(b * mh, b * mh)
    BkXX = 0.5 * (BkXX + BkXX.T)
    var = np.kron(BkXX, A)
    return mean, var


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from bayesian_cbf_tpu.models.mvgp import make_mvgp

    rng = np.random.default_rng(12345)
    n, m, K, b = 2, 1, 24, 5
    X = rng.normal(size=(K, n))
    U = rng.normal(size=(K, m))
    Xdot = rng.normal(size=(K, n))
    Xtest = rng.normal(size=(b, n))

    gp = make_mvgp(n, m)
    params = gp.init_params(jax.random.PRNGKey(7))
    # perturb the hyperparameters away from init symmetry
    params = params._replace(
        raw_lengthscale=jnp.asarray([0.3, 0.9]),
        raw_outputscale=jnp.asarray(0.7),
        raw_vA=jnp.asarray([0.2, 0.5]),
        raw_vB=jnp.asarray([0.4, 0.1]),
        mean_M=jnp.asarray(rng.normal(size=(1 + m, n)) * 0.3))

    data = gp.make_data(X, U, Xdot)
    cache = gp.refresh_cache(params, data)
    mean_jax, var_jax = gp.predict_fullmat(params, data, cache, Xtest)
    mean_jax = np.asarray(mean_jax)
    var_jax = np.asarray(var_jax)

    UH = np.concatenate([np.ones((K, 1)), U], 1)
    mean_np, var_np = numpy_mvgp_posterior(
        np.asarray(params.raw_lengthscale), np.asarray(params.raw_outputscale),
        np.asarray(params.W_A), np.asarray(params.raw_vA),
        np.asarray(params.W_B), np.asarray(params.raw_vB),
        np.asarray(params.mean_M), X, UH, Xdot, Xtest, gp.jitter)
    # second reference set with the f32 path's nugget, for the f32 test
    mean_np32, var_np32 = numpy_mvgp_posterior(
        np.asarray(params.raw_lengthscale), np.asarray(params.raw_outputscale),
        np.asarray(params.W_A), np.asarray(params.raw_vA),
        np.asarray(params.W_B), np.asarray(params.raw_vB),
        np.asarray(params.mean_M), X, UH, Xdot, Xtest, gp.jitter,
        eps=np.finfo(np.float32).eps)

    dm = np.max(np.abs(mean_jax - mean_np))
    dv = np.max(np.abs(var_jax - var_np))
    print("oracle-vs-jax: mean", dm, "var", dv)
    assert dm < 1e-9 and dv < 1e-9, "JAX posterior does not match the oracle"

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "golden_posterior.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out,
             X=X, U=U, Xdot=Xdot, Xtest=Xtest,
             raw_lengthscale=np.asarray(params.raw_lengthscale),
             raw_outputscale=np.asarray(params.raw_outputscale),
             W_A=np.asarray(params.W_A), raw_vA=np.asarray(params.raw_vA),
             W_B=np.asarray(params.W_B), raw_vB=np.asarray(params.raw_vB),
             mean_M=np.asarray(params.mean_M),
             mean=mean_np, var=var_np,
             mean_f32nug=mean_np32, var_f32nug=var_np32)
    print("wrote", out)


if __name__ == "__main__":
    main()
