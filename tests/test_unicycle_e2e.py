"""End-to-end unicycle Bayes-CBF rollout tests (short horizons for CI).

The full 2000-step qualitative parity runs (collides vs safe vs stuck,
README experiments) live in experiments/ and bench.py; here we check the
jitted scan pipeline is healthy: finite outputs, near-feasible SOCP at
every step, online refits occurring, vmap batching.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_cbf_tpu.experiments.unicycle import (
    make_ackermann_tracking_sim, min_obstacle_clearance, STATE_START)
from bayesian_cbf_tpu.sim.rollout import simulate_unicycle


def _small_sim(**kw):
    kw.setdefault("numSteps", 60)
    kw.setdefault("dt", 0.01)
    kw.setdefault("max_train", 16)
    kw.setdefault("training_iter", 10)
    kw.setdefault("train_every_n_steps", 20)
    kw.setdefault("socp_iters", 20)
    return make_ackermann_tracking_sim(**kw)


def test_rollout_finite_and_feasible():
    sim = _small_sim(enable_learning=False, true_L=12.0, mean_L=1.0,
                     kernel_diag_A=(1e-2, 1e-2, 1e-2))
    out = simulate_unicycle(sim, jnp.asarray(STATE_START))
    assert np.all(np.isfinite(np.asarray(out.X)))
    assert np.all(np.isfinite(np.asarray(out.U)))
    # every per-step SOCP stayed near-feasible
    assert float(out.info.pres.max()) < 1e-5
    assert float(out.info.dres.max()) < 1e-4


def test_rollout_with_learning_runs():
    sim = _small_sim(enable_learning=True, true_L=1.0, mean_L=12.0)
    out = simulate_unicycle(sim, jnp.asarray(STATE_START))
    assert np.all(np.isfinite(np.asarray(out.X)))
    assert np.all(np.isfinite(np.asarray(out.U)))
    # the vehicle moved
    assert float(jnp.linalg.norm(out.X[-1] - out.X[0])) > 1e-3


def test_risk_controls_conservatism():
    """Higher required safety (smaller max_risk) => larger rho factor and
    no smaller obstacle clearance (the Bayes-CBF mechanism)."""
    out_lo = simulate_unicycle(
        _small_sim(max_risk=0.4999, enable_learning=False,
                   true_L=12.0, mean_L=1.0,
                   kernel_diag_A=(1e-2, 1e-2, 1e-2)),
        jnp.asarray(STATE_START))
    sim_hi = _small_sim(max_risk=0.01, enable_learning=False,
                        true_L=12.0, mean_L=1.0,
                        kernel_diag_A=(1e-2, 1e-2, 1e-2))
    out_hi = simulate_unicycle(sim_hi, jnp.asarray(STATE_START))
    assert float(out_hi.info.rho[0]) > float(out_lo.info.rho[0]) + 1.0
    cl_lo = min_obstacle_clearance(sim_hi, out_lo)
    cl_hi = min_obstacle_clearance(sim_hi, out_hi)
    assert float(cl_hi.min()) >= float(cl_lo.min()) - 0.05


def test_vmap_batch_of_rollouts():
    """Monte-Carlo batching: vmap over initial states (the BASELINE.json
    config-5 capability, 1024 parallel rollouts, here 3 for CI)."""
    sim = _small_sim(numSteps=30, enable_learning=False, true_L=12.0,
                     mean_L=1.0, kernel_diag_A=(1e-2, 1e-2, 1e-2))
    x0s = jnp.asarray(STATE_START)[None, :] + jnp.array(
        [[0.0, 0.0, 0.0], [0.05, 0.0, 0.0], [0.0, 0.05, 0.0]])
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    from bayesian_cbf_tpu.sim.rollout import _simulate_unicycle
    outs = jax.jit(jax.vmap(
        lambda x0, k: _simulate_unicycle(sim, x0, k)[0]))(x0s, keys)
    assert outs.X.shape == (3, 30, 3)
    assert np.all(np.isfinite(np.asarray(outs.X)))
    # batched trajectories differ with initial state
    assert float(jnp.abs(outs.X[0] - outs.X[1]).max()) > 1e-6


def test_warm_started_ipm_matches_cold():
    """Warm-starting the per-step SOCP from the previous step's (x, s, z)
    must reproduce the 25-iteration cold solve (VERDICT round-1 item 2b):
    pointwise while the problem moves continuously (before the first GP
    refit), and at the outcome level across the refit jump (the staleness
    gate cold-restarts there; the closed loop is chaotic, so post-jump
    pointwise comparison is not meaningful)."""
    import numpy as np
    from bayesian_cbf_tpu.experiments.unicycle import (goal_distance,
                                                       min_obstacle_clearance)
    kw = dict(numSteps=60, dt=0.01, max_train=16, training_iter=6,
              train_every_n_steps=25)
    cold = make_ackermann_tracking_sim(**kw)
    warm = make_ackermann_tracking_sim(warm_start=True, **kw)
    oc = simulate_unicycle(cold, jnp.asarray(STATE_START))
    ow = simulate_unicycle(warm, jnp.asarray(STATE_START))
    assert float(np.mean(np.asarray(ow.info.feasible))) > 0.95
    # exact tracking over the continuous (pre-refit) prefix
    np.testing.assert_allclose(np.asarray(ow.U[:25]), np.asarray(oc.U[:25]),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(ow.X[:26]), np.asarray(oc.X[:26]),
                               atol=1e-3)
    # outcome-level equivalence across the refit jump
    cc = np.asarray(min_obstacle_clearance(cold, oc))
    cw = np.asarray(min_obstacle_clearance(warm, ow))
    assert np.all(cw > 0) == np.all(cc > 0)
    assert abs(float(goal_distance(ow)) - float(goal_distance(oc))) < 0.2


def test_golden_e2e_trajectory():
    """End-to-end golden fixture: the full learn+solve+step loop on a
    committed 40-step f64 episode (controls, states, feasibility).
    Guards against silent behavior drift when the solver/fit kernels are
    optimized; the fixture was generated by the same code path, so this
    is a REGRESSION pin, not an independent oracle (the independent
    oracles are tests/test_f32_and_golden.py and the SOCP/scipy
    cross-checks)."""
    import os.path as osp
    import numpy as np
    import jax
    import jax.numpy as jnp
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    from bayesian_cbf_tpu.sim.rollout import simulate_unicycle
    ref = np.load(osp.join(osp.dirname(__file__), "data",
                           "golden_e2e_unicycle.npz"))
    sim = make_ackermann_tracking_sim(numSteps=40, dt=0.01, max_train=24,
                                      training_iter=10,
                                      train_every_n_steps=15)
    out = simulate_unicycle(sim, STATE_START, key=jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(out.X), ref["X"], rtol=1e-6,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.U), ref["U"], rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out.info.feasible) > 0.5,
                                  ref["feasible"] > 0.5)


def test_single_runner_matches_segmented_reference():
    """Round-3 directive 8: the single-episode scan-with-cond runner must
    reproduce the segmented-scan schedule EXACTLY (fit after every
    positive multiple of train_every, outputs recorded pre-fit)."""
    from bayesian_cbf_tpu.sim.rollout import (fit_segments,
                                              _simulate_unicycle)
    sim = _small_sim(numSteps=31, train_every_n_steps=10, max_train=12,
                     training_iter=4)
    x0 = jnp.asarray(STATE_START)
    key = jax.random.PRNGKey(3)

    # segmented reference (the pre-round-3 runner, inlined)
    lrn = sim.learned_dynamics
    carry = sim.init_state(x0, key)
    segs = fit_segments(sim.numSteps, lrn.train_every_n_steps,
                        lrn.enable_learning)
    assert len(segs) == 3, segs   # fits after steps 10, 20, 30
    ys = []
    for (s, e, do_fit) in segs:
        carry, y = jax.lax.scan(sim.step_no_fit, carry, jnp.arange(s, e))
        ys.append(y)
        if do_fit:
            st = carry[1]
            fitted = lrn.fit_now(st)
            st = jax.tree.map(
                lambda a, b: jnp.where(st.count_res > 0, a, b), fitted, st)
            carry = (carry[0], st) + tuple(carry[2:])
    Xs, Us = (jnp.concatenate([y[0] for y in ys], 0),
              jnp.concatenate([y[1] for y in ys], 0))

    out = _simulate_unicycle(sim, x0, key)[0]
    # the two program structures round differently at ~1e-15/step and the
    # closed loop amplifies that (measured: 3e-15 at t=1, 4.6e-8 by t=10);
    # schedule equality shows as agreement THROUGH the first fits — a
    # schedule off-by-one diverges at O(1) within one step (the GP mean
    # jumps at the fit step).  Check tight agreement through t=12 (past
    # the first fit at t=10) and loose agreement to the horizon.
    np.testing.assert_allclose(np.asarray(out.X)[:13], np.asarray(Xs)[:13],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.U)[:13], np.asarray(Us)[:13],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.X), np.asarray(Xs),
                               rtol=2e-3, atol=2e-3)
