"""Fused fit-Gram + solve + logdet op (ops/gramsolve.py).

Checks, all on CPU (f64 where the claim is exactness, f32 +
interpret-mode for the kernel path):
  * km_expr reproduces the mll's masked-Gram expression (gram_kb *
    mask_outer + identity on invalid diagonal) exactly;
  * gram_solve_logdet's custom VJP equals autodiff through the
    explicit expression;
  * the fused Pallas kernel (interpret mode) matches the reference
    expression + NumPy inverse/slogdet, masked rows included;
  * MVGP.mll value and gradient are unchanged by FUSED_FIT (the
    round-3 fit-path rewiring), batched and unbatched.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_cbf_tpu.models import mvgp as mvgp_mod
from bayesian_cbf_tpu.models.mvgp import make_mvgp_rank1
from bayesian_cbf_tpu.ops import gramsolve


def _random_inputs(rng, k=23, xd=3, mh=3, dtype=jnp.float64, masked=True):
    X = jnp.asarray(np.cumsum(rng.normal(scale=0.1, size=(k, xd)), 0), dtype)
    UH = jnp.asarray(rng.normal(size=(k, mh)), dtype)
    B = rng.normal(size=(mh, mh))
    sB = jnp.asarray(1.3 * (B @ B.T + mh * np.eye(mh)), dtype)
    UB = UH @ sB
    inv_ell = jnp.asarray(1.0 / rng.uniform(0.5, 2.0, size=xd), dtype)
    # scale-aware nugget, production-class conditioning: these random
    # rank-deficient Grams (rbf ~ 1, ubu rank mh) hit kappa ~ scale/nug,
    # so pin kappa ~ 1e3 — the production mll nugget bounds kappa at
    # ~1/(10 k eps) ~ 4e3 the same way.  (A fixed 1e-4 nugget sends
    # kappa to ~3e5 and the f32 sweep — plain AND fused — to garbage;
    # measured while writing this test.)
    diag = np.sum(np.asarray(UB) * np.asarray(UH), -1)
    scale = max(float(np.mean(np.abs(diag))), 1.0)
    nug = jnp.asarray(1e-6 + 1e-3 * scale, dtype)
    mask = jnp.asarray(
        (np.arange(k) < (k - 5 if masked else k)).astype(np.float64), dtype)
    Y = jnp.asarray(rng.normal(size=(k, xd)), dtype)
    return X, UB, UH, inv_ell, nug, mask, Y


def test_km_expr_matches_mll_gram_expression():
    """km_expr == gram_kb * mask_outer + eye*(1-m), the exact expression
    MVGP.mll factorizes (models/mvgp.py)."""
    rng = np.random.default_rng(0)
    gp = make_mvgp_rank1(3, 2)
    params = gp.init_params(jax.random.PRNGKey(0), dtype=jnp.float64)
    k = 17
    X = np.cumsum(rng.normal(scale=0.01, size=(k, 3)), 0)
    U = rng.normal(size=(k, 2))
    Xd = rng.normal(size=(k, 3))
    data = gp.make_data(X, U, Xd)
    data = data._replace(mask=data.mask.at[-4:].set(0.0))

    m = data.mask
    outer = m[:, None] * m[None, :]
    eye = jnp.eye(k, dtype=jnp.float64)
    want = gp.gram_kb(params, data) * outer + eye * (1.0 - m)[:, None]

    eps = jnp.finfo(jnp.float64).eps
    UB = data.UH @ (params.outputscale * params.B)
    diagKb = jnp.sum(UB * data.UH, -1)
    scale = jnp.maximum(jnp.mean(jnp.abs(diagKb)), 1.0)
    nug = gp.jitter + 10.0 * k * eps * scale
    got = gramsolve.km_expr(data.X, UB, data.UH,
                            1.0 / params.lengthscale, nug, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


def test_gram_solve_logdet_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    X, UB, UH, inv_ell, nug, mask, Y = _random_inputs(rng)
    W = jnp.asarray(rng.normal(size=Y.shape))

    def f_custom(X, UB, UH, inv_ell, nug, Y):
        S, ld = gramsolve.gram_solve_logdet(X, UB, UH, inv_ell, nug,
                                            mask, Y)
        return jnp.sum(W * S) + 1.7 * ld

    def f_ref(X, UB, UH, inv_ell, nug, Y):
        Km = gramsolve.km_expr(X, UB, UH, inv_ell, nug, mask)
        S = jnp.linalg.solve(Km, Y)
        sgn, ld = jnp.linalg.slogdet(Km)
        return jnp.sum(W * S) + 1.7 * ld

    args = (X, UB, UH, inv_ell, nug, Y)
    v1, g1 = jax.value_and_grad(f_custom, argnums=(0, 1, 2, 3, 4, 5))(*args)
    v2, g2 = jax.value_and_grad(f_ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("batched", [False, True])
def test_mll_unchanged_by_fused_fit(batched):
    """FUSED_FIT=True vs False: identical MLL value and gradient (f64)."""
    rng = np.random.default_rng(3)
    gp = make_mvgp_rank1(3, 2)
    params = gp.init_params(jax.random.PRNGKey(1), dtype=jnp.float64)
    k = 19

    def one(seed):
        r = np.random.default_rng(seed)
        X = np.cumsum(r.normal(scale=0.01, size=(k, 3)), 0)
        return gp.make_data(X, r.normal(size=(k, 2)), r.normal(size=(k, 3)))

    if batched:
        datas = jax.tree.map(lambda *a: jnp.stack(a), *[one(s) for s in range(4)])
        paramss = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (4,) + a.shape), params)
        f = jax.vmap(lambda p, d: jax.value_and_grad(gp.mll)(p, d))
        args = (paramss, datas)
    else:
        f = jax.value_and_grad(gp.mll)
        args = (params, one(0))

    old = mvgp_mod.FUSED_FIT
    try:
        mvgp_mod.FUSED_FIT = True
        v1, g1 = f(*args)
        mvgp_mod.FUSED_FIT = False
        v2, g2 = f(*args)
    finally:
        mvgp_mod.FUSED_FIT = old
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-10)


def test_gram_kinv_logdet_nested_vmap():
    """Nested vmap over gram_kinv_logdet must collapse the leading batch
    dims (same treatment as cholinv's rule) instead of crashing."""
    rng = np.random.default_rng(7)
    rows = [[_random_inputs(rng, k=12, dtype=jnp.float64)[:6]
             for _ in range(2)] for _ in range(3)]
    stack = lambda i: jnp.stack([jnp.stack([rows[a][b][i]
                                            for b in range(2)])
                                 for a in range(3)])
    X, UB, UH, inv_ell, nug, mask = [stack(i) for i in range(6)]
    f = jax.vmap(jax.vmap(gramsolve.gram_kinv_logdet))
    Kinv, ld = f(X, UB, UH, inv_ell, nug, mask)
    assert Kinv.shape == (3, 2, 12, 12) and ld.shape == (3, 2)
    Km00 = gramsolve.km_expr(X[1, 1], UB[1, 1], UH[1, 1],
                             inv_ell[1, 1], nug[1, 1], mask[1, 1])
    np.testing.assert_allclose(np.asarray(Kinv[1, 1]),
                               np.linalg.inv(np.asarray(Km00)),
                               rtol=1e-8, atol=1e-10)
