"""float32 fast-path regression tests + stored-posterior parity fixture.

Round-1 VERDICT items 5 (weak #4/#5): every f32 guard on the TPU fast
path — mean-only cones near max_risk=0.5, the dtype-aware feasibility
gate, the NaN-guarded Adam fit — was previously exercised only by manual
TPU runs; these lock them in on CPU.  The golden fixture pins the MVGP
posterior against an output computed by an independent pure-NumPy
implementation of the reference algorithm
(bayes_cbf/control_affine_model.py:983-1091; generator:
scripts/make_golden_posterior.py)."""
import math
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_cbf_tpu.experiments.unicycle import (
    make_ackermann_tracking_sim, min_obstacle_clearance, STATE_START)
from bayesian_cbf_tpu.models.mvgp import make_mvgp
from bayesian_cbf_tpu.sim.rollout import simulate_unicycle

DATA = osp.join(osp.dirname(__file__), "data")

F32 = jnp.float32


def _f32_sim(**kw):
    """Build the whole sim pipeline in float32 (x0/x_goal drive the dtype
    of planner, obstacles, and learner state)."""
    kw.setdefault("x0", jnp.asarray(STATE_START, F32))
    kw.setdefault("x_goal", jnp.asarray([0.0, 0.0, math.pi / 4], F32))
    return make_ackermann_tracking_sim(**kw)


def test_f32_learning_rollout_finite_and_feasible():
    sim = _f32_sim(numSteps=60, dt=0.01, max_train=16, training_iter=8,
                   train_every_n_steps=25, warm_start=True)
    out = simulate_unicycle(sim, jnp.asarray(STATE_START, F32))
    assert out.X.dtype == F32 and out.U.dtype == F32
    assert bool(jnp.all(jnp.isfinite(out.X)))
    assert bool(jnp.all(jnp.isfinite(out.U)))
    # the dtype-aware feasibility gate (5e-3 in f32) must accept the bulk
    # of well-posed steps
    assert float(jnp.mean(out.info.feasible)) > 0.9
    assert float(jnp.min(min_obstacle_clearance(sim, out))) > 0.0


def test_f32_mean_only_cones_near_half_risk():
    """max_risk -> 0.5 emits the constraints as linear 1-dim cones
    (bayes_controller.py mean_only path) — the f32-conditioning guard."""
    sim = _f32_sim(numSteps=40, dt=0.01, max_risk=0.4999,
                   enable_learning=False, true_L=12.0, mean_L=1.0,
                   kernel_diag_A=(1e-2,) * 3)
    out = simulate_unicycle(sim, jnp.asarray(STATE_START, F32))
    assert out.X.dtype == F32
    assert bool(jnp.all(jnp.isfinite(out.X)))
    assert float(jnp.mean(out.info.feasible)) > 0.9


def test_f32_infeasibility_fallback_returns_ctrl_ref():
    """Pathologically tight risk + huge prior variance: every step's SOCP
    is infeasible; the in-graph fallback must hold u = ctrl_ref with no
    NaNs (the reference raises InfeasibleProblemError instead,
    optimizers.py:74-86)."""
    sim = _f32_sim(numSteps=30, dt=0.01, max_risk=0.001,
                   kernel_diag_A=(50.0,) * 3, enable_learning=False)
    out = simulate_unicycle(sim, jnp.asarray(STATE_START, F32))
    assert bool(jnp.all(jnp.isfinite(out.X)))
    assert float(jnp.mean(out.info.feasible)) == 0.0
    np.testing.assert_allclose(np.asarray(out.U),
                               np.zeros_like(np.asarray(out.U)), atol=0)


def test_f32_fit_nan_guard_on_degenerate_data():
    """Repeated identical samples make the Gram singular; the NaN-guarded
    Adam step (mvgp.py fit) must keep parameters finite in f32."""
    gp = make_mvgp(2, 1)
    params = gp.init_params(jax.random.PRNGKey(0), dtype=F32)
    X = jnp.tile(jnp.asarray([[0.3, -0.2]], F32), (16, 1))
    U = jnp.tile(jnp.asarray([[0.7]], F32), (16, 1))
    Xdot = jnp.tile(jnp.asarray([[0.1, 0.4]], F32), (16, 1))
    data = gp.make_data(X, U, Xdot)
    fitted = gp.fit(params, data, training_iter=25)
    for leaf in jax.tree.leaves(fitted):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # posterior still evaluable
    cache = gp.refresh_cache(fitted, data)
    mean, var = gp.predict_fullmat(fitted, data, cache,
                                   jnp.asarray([[0.0, 0.0]], F32))
    assert bool(jnp.all(jnp.isfinite(mean)))
    assert bool(jnp.all(jnp.isfinite(var)))


def test_golden_posterior_parity():
    """MVGP.predict_fullmat must reproduce the committed posterior computed
    by the independent NumPy oracle (scripts/make_golden_posterior.py)."""
    z = np.load(osp.join(DATA, "golden_posterior.npz"))
    gp = make_mvgp(2, 1)
    params = gp.init_params(jax.random.PRNGKey(7))
    params = params._replace(
        raw_lengthscale=jnp.asarray(z["raw_lengthscale"]),
        raw_outputscale=jnp.asarray(z["raw_outputscale"]),
        W_A=jnp.asarray(z["W_A"]), raw_vA=jnp.asarray(z["raw_vA"]),
        W_B=jnp.asarray(z["W_B"]), raw_vB=jnp.asarray(z["raw_vB"]),
        mean_M=jnp.asarray(z["mean_M"]))
    data = gp.make_data(z["X"], z["U"], z["Xdot"])
    cache = gp.refresh_cache(params, data)
    mean, var = gp.predict_fullmat(params, data, cache,
                                   jnp.asarray(z["Xtest"]))
    np.testing.assert_allclose(np.asarray(mean), z["mean"],
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(var), z["var"],
                               rtol=1e-8, atol=1e-10)


def test_golden_posterior_parity_f32():
    """The f32 fast path tracks the f64 golden posterior to float32
    accuracy (the TPU inference dtype)."""
    z = np.load(osp.join(DATA, "golden_posterior.npz"))
    gp = make_mvgp(2, 1)
    params = gp.init_params(jax.random.PRNGKey(7), dtype=F32)
    params = params._replace(
        raw_lengthscale=jnp.asarray(z["raw_lengthscale"], F32),
        raw_outputscale=jnp.asarray(z["raw_outputscale"], F32),
        W_A=jnp.asarray(z["W_A"], F32), raw_vA=jnp.asarray(z["raw_vA"], F32),
        W_B=jnp.asarray(z["W_B"], F32), raw_vB=jnp.asarray(z["raw_vB"], F32),
        mean_M=jnp.asarray(z["mean_M"], F32))
    data = gp.make_data(jnp.asarray(z["X"], F32), jnp.asarray(z["U"], F32),
                        jnp.asarray(z["Xdot"], F32))
    cache = gp.refresh_cache(params, data)
    mean, var = gp.predict_fullmat(params, data, cache,
                                   jnp.asarray(z["Xtest"], F32))
    assert mean.dtype == F32
    # reference computed with the f32 path's nugget (the dtype-aware
    # Gram regularization is part of the model, not roundoff — see
    # MVGP.gram_kb); fall back to the f64 set for old fixtures
    mean_ref = z["mean_f32nug"] if "mean_f32nug" in z.files else z["mean"]
    var_ref = z["var_f32nug"] if "var_f32nug" in z.files else z["var"]
    np.testing.assert_allclose(np.asarray(mean), mean_ref,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(var), var_ref,
                               rtol=2e-3, atol=2e-3)
