"""The batched FIT inversion must survive REAL fit-Gram conditioning.

Flagship training buffers hold trajectory points dt apart, so the RBF
fit Gram has highly correlated rows: with the dtype-aware relative
nugget its f32 condition number sits at ~1e6 (diag ~1, max eig ~k,
min eig ~ the 2.4e-4-scale nugget).  Round-3 regression pinned here:
the recursive Schur/sweep inversion (ops/pallas_sweep.py) produces
NON-FINITE output on such Grams for every recursive split (a
near-singular leading block's explicit inverse carries O(kappa*eps)
~ 0.1 relative error, the Schur complement goes indefinite, a
negative pivot hits the 1e-12 clamp and 1/tiny overflows).  The fit's
NaN guard then rejects every Adam step and batched learning silently
dies — observed as the flagship Monte-Carlo mean-goal-distance
0.53 -> 2.81 regression (records/tpu_round3.jsonl) that the
single-episode outcome gate (unbatched => XLA path) cannot see.

Fix: `cholinv.FIT_INVERSE` routes the fit inversion through a
blocked-Cholesky kernel (trailing updates on original data,
backward-stable; measured resid ~9e-3 on the same Grams) — since
round 4 the fused "cholk" variant (same arithmetic, one Pallas call).
Reference fit-loop semantics: bayes_cbf/control_affine_model.py:310-334.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_cbf_tpu.ops import cholinv
from bayesian_cbf_tpu.ops import gramsolve
from bayesian_cbf_tpu.ops.pallas_chol import batched_chol_with_inv
from bayesian_cbf_tpu.ops import pallas_sweep as ps


def _trajectory_gram(k=200, xd=3, step=0.02, nug=2.5e-4, seed=42):
    """Random-walk RBF Gram: the conditioning structure of a real
    flagship fit buffer (kappa ~ 8e5 in f32 at these defaults)."""
    rng = np.random.default_rng(seed)
    X = np.cumsum(step * rng.normal(size=(k, xd)), 0).astype(np.float32)
    d = X[:, None, :] - X[None, :, :]
    K0 = np.exp(-0.5 * np.sum(d * d, -1))
    return (K0 + nug * np.eye(k)).astype(np.float32)


def test_default_fit_inverse_is_cholk():
    """Round 4: the fused single-call kernel (factor + assembly + Kinv in
    VMEM) is the default — same trailing-update arithmetic as "chol",
    measured 9.8 -> 5.3 ms/Adam-iter at (256, 200) on chip."""
    assert cholinv.FIT_INVERSE == "cholk"


def test_chol_fit_inverse_survives_trajectory_gram():
    Km = _trajectory_gram()
    M64 = Km.astype(np.float64)
    assert np.linalg.cond(M64) > 1e5          # the regime that matters
    Kinv, ld = cholinv.batched_kinv_logdet_fit(
        jnp.asarray(Km)[None], interpret=True)
    Kinv = np.asarray(Kinv[0], np.float64)
    assert np.all(np.isfinite(Kinv))
    resid = np.max(np.abs(Kinv @ M64 - np.eye(Km.shape[0])))
    assert resid < 5e-2, resid
    sign, logdet64 = np.linalg.slogdet(M64)
    assert sign > 0
    assert abs(float(ld[0]) - logdet64) < 0.5


def test_sweep_recursion_fails_on_trajectory_gram_pinned():
    """Documents WHY the sweep kernel is not the fit default: any
    recursive split is non-finite on the trajectory Gram.  If this
    starts passing, the sweep recursion was fixed — re-evaluate
    FIT_INVERSE for the ~2x per-inversion win."""
    Km = _trajectory_gram()
    Kinv, ld = ps.batched_kinv_logdet(
        jnp.asarray(Km)[None], interpret=True, chunk=1)
    assert not bool(np.all(np.isfinite(np.asarray(Kinv)))) \
        or not bool(np.isfinite(float(ld[0])))


def test_fused_f32_fit_moves_hyperparameters_on_trajectory_data():
    """End-to-end: the batched f32 fused fit (the flagship TPU path,
    kernels in interpret mode) must actually train on trajectory-
    correlated data — the regression left hyperparameters at init."""
    from bayesian_cbf_tpu.models.mvgp import make_mvgp
    import bayesian_cbf_tpu.models.mvgp as mv

    k, xd, m = 64, 3, 2
    rng = np.random.default_rng(0)
    X = np.cumsum(0.02 * rng.normal(size=(k, xd)), 0).astype(np.float32)
    U = rng.normal(size=(k, m)).astype(np.float32)
    UH = np.concatenate([np.ones((k, 1), np.float32), U], 1)
    Xdot = np.cumsum(0.1 * rng.normal(size=(k, xd)), 0).astype(np.float32)

    gp = make_mvgp(xd, m)
    params = gp.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    data = gp.empty_data(k, dtype=jnp.float32)._replace(
        X=jnp.asarray(X), UH=jnp.asarray(UH), Xdot=jnp.asarray(Xdot),
        mask=jnp.ones((k,), jnp.float32))

    B = 2
    bro = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), t)
    old_fused, old_use = mv.FUSED_FIT, gramsolve.USE_FUSED
    orig_bkl = cholinv.batched_kinv_logdet_fit
    try:
        mv.FUSED_FIT = True
        gramsolve.USE_FUSED = True          # force the kernel path on CPU
        cholinv.batched_kinv_logdet_fit = \
            lambda K3, interpret=False: orig_bkl(K3, interpret=True)
        fit = jax.jit(jax.vmap(
            lambda p, d: gp.fit(p, d, training_iter=8)))
        out = fit(bro(params), bro(data))
        mll = jax.vmap(gp.mll)(out, bro(data))
    finally:
        mv.FUSED_FIT, gramsolve.USE_FUSED = old_fused, old_use
        cholinv.batched_kinv_logdet_fit = orig_bkl
    assert bool(jnp.all(jnp.isfinite(mll))), np.asarray(mll)
    moved = np.max(np.abs(np.asarray(out.lengthscale[0])
                          - np.asarray(params.lengthscale)))
    assert moved > 1e-4, "fit never moved a hyperparameter"


def test_sweep_full_is_finite_but_opt_in():
    """The NON-recursive full-width sweep (FIT_INVERSE='sweep_full')
    stays finite on the trajectory Gram — no Schur split means no
    explicit inverse of a near-singular leading block — but measured
    2x slower than the chol kernel in-program (records fit_chol_nb_ab:
    20.3 vs 9.7 ms/Adam-iter), so it stays opt-in."""
    Km = _trajectory_gram()
    M64 = Km.astype(np.float64)
    old = cholinv.FIT_INVERSE
    try:
        cholinv.FIT_INVERSE = "sweep_full"
        Kinv, ld = cholinv.batched_kinv_logdet_fit(
            jnp.asarray(Km)[None], interpret=True)
    finally:
        cholinv.FIT_INVERSE = old
    Kinv = np.asarray(Kinv[0], np.float64)
    assert np.all(np.isfinite(Kinv))
    resid = np.max(np.abs(Kinv @ M64 - np.eye(Km.shape[0])))
    assert resid < 5e-2, resid
    sign, logdet64 = np.linalg.slogdet(M64)
    assert abs(float(ld[0]) - logdet64) < 0.5
