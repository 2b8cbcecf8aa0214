"""Tests for car models, trigger intervals, logging/checkpointing,
secondary controllers, planners, and fast-vs-GP controller equivalence."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_cbf_tpu.models.car import (SecondOrderUnicycle,
                                         HyundaiGenesisDynamics,
                                         CircularObstacleCBC)
from bayesian_cbf_tpu.models.dynamics import (AckermannDrive,
                                              PendulumDynamics)
from bayesian_cbf_tpu.control.secondary import (LQRController,
                                                GreedyController,
                                                EpsilonGreedyController,
                                                ZeroController,
                                                PIDController,
                                                ILQRController)
from bayesian_cbf_tpu.control.planner import (PiecewiseLinearPlanner,
                                              SplinePlanner, NoPlanner)
from bayesian_cbf_tpu.control.clf_cbf import CLFCartesian, cartesian2polar, \
    polar2cartesian
from bayesian_cbf_tpu.observability.trigger import trigger_intervals
from bayesian_cbf_tpu.observability.logger import (MetricsLogger,
                                                   save_checkpoint,
                                                   load_checkpoint,
                                                   load_metrics)


def test_coordinate_roundtrip():
    """polar <-> cartesian round trip (doctest parity,
    unicycle_move_to_pose.py:93-125)."""
    rng = np.random.default_rng(0)
    state = jnp.asarray(rng.uniform(-1, 1, 3))
    goal = jnp.asarray(rng.uniform(1.5, 2.5, 3))
    polar = cartesian2polar(state, goal)
    back = polar2cartesian(polar, goal)
    np.testing.assert_allclose(np.asarray(back), np.asarray(state),
                               atol=1e-6)


def test_genesis_straight_line():
    """Genesis with constant accel and zero steer accelerates forward."""
    car = HyundaiGenesisDynamics()
    X = car.init_state()
    U = jnp.array([2.0, 1.0, 0.0])     # 2 m/s^2, steer=atan2(0,1)=0

    def roll(X, _):
        Xn, _ = car.step(X, U)
        return Xn, Xn

    X_fin, traj = jax.lax.scan(roll, X, None, length=200)
    traj = np.asarray(traj)
    assert traj[-1, 3] > 1.0           # vx grew
    assert traj[-1, 0] > 1.0           # moved forward in x
    assert abs(traj[-1, 1]) < 0.2      # no sideways drift at zero steer


def test_genesis_turns_with_steer():
    car = HyundaiGenesisDynamics()
    X = car.init_state().at[3].set(5.0)   # rolling at 5 m/s
    steer = 0.1
    U = jnp.array([0.0, math.cos(steer), math.sin(steer)])

    def roll(X, _):
        Xn, _ = car.step(X, U)
        return Xn, Xn

    _, traj = jax.lax.scan(roll, X, None, length=300)
    traj = np.asarray(traj)
    assert abs(traj[-1, 2]) > 0.02     # heading changed


def test_circular_cbc_lie_derivatives():
    """CBC2 b(x) assembles gamma-weighted Lie derivatives; cross-check the
    rel-deg-2 structure on the 2nd-order unicycle (position depends on
    state only through f)."""
    model = SecondOrderUnicycle()
    cbc = CircularObstacleCBC(center=jnp.array([1.0, 1.0]), radius=0.5,
                              pos_idx=(3, 4))
    X = jnp.array([0.5, 0.1, 0.05, -1.0, 0.2, 0.3])
    # L_g h must be zero (relative degree >= 2): h depends on x,y only,
    # g only actuates vx, vy, w
    Lg_h = cbc.grad_cbf(X) @ model.g_func(X)
    np.testing.assert_allclose(np.asarray(Lg_h), 0.0, atol=1e-12)
    # L_g L_f h nonzero (degree exactly 2)
    assert np.abs(np.asarray(cbc.lie_g_lie_f(model, X))).max() > 1e-6


def test_lqr_drives_to_goal():
    pend = PendulumDynamics()
    lqr = LQRController(Q=jnp.eye(2), R=jnp.eye(1) * 0.1,
                        x_goal=jnp.zeros(2), horizon=50, dt=0.01,
                        ctrl_range=(-50.0, 50.0))

    def roll(x, _):
        u = lqr.control_with_model(pend.f_func, pend.g_func, x, 0)
        xn, _ = pend.step(x, u, 0.01)
        return xn, xn

    x0 = jnp.array([0.5, 0.0])
    xf, _ = jax.lax.scan(roll, x0, None, length=600)
    assert float(jnp.linalg.norm(xf)) < 0.1


def test_ilqr_reduces_cost_and_reaches_goal():
    """The affine-backprop iLQR (bayes_cbf/ilqr.py:43-76) must (a) beat
    zero control on its own quadratic objective over the horizon and
    (b) drive the pendulum to the goal in closed loop."""
    pend = PendulumDynamics()
    Q = jnp.eye(2)
    R = jnp.eye(1) * 0.1
    xg = jnp.zeros(2)
    ilqr = ILQRController(Q=Q, R=R, x_goal=xg, horizon=60, dt=0.01,
                          lqr_iter=3, ctrl_range=(-50.0, 50.0))

    def traj_cost(x0, controller):
        def step(x, i):
            u = controller(x, i)
            xn, _ = pend.step(x, u, 0.01)
            c = (x - xg) @ Q @ (x - xg) + u @ R @ u
            return xn, c
        _, cs = jax.lax.scan(step, x0, jnp.arange(150))
        return float(jnp.sum(cs))

    x0 = jnp.array([0.8, 0.0])
    c_zero = traj_cost(x0, lambda x, i: jnp.zeros((1,)))
    c_ilqr = traj_cost(
        x0, lambda x, i: ilqr.control_with_model(pend.f_func, pend.g_func,
                                                 x, i))
    assert c_ilqr < 0.5 * c_zero, (c_ilqr, c_zero)
    # the nonlinear refinement must do at least as well as pure LQR
    lqr = LQRController(Q=Q, R=R, x_goal=xg, horizon=60, dt=0.01,
                        ctrl_range=(-50.0, 50.0))
    c_lqr = traj_cost(
        x0, lambda x, i: lqr.control_with_model(pend.f_func, pend.g_func,
                                                x, i))
    assert c_ilqr <= c_lqr + 1e-6, (c_ilqr, c_lqr)

    # closed loop reaches the goal
    def roll(x, _):
        u = ilqr.control_with_model(pend.f_func, pend.g_func, x, 0)
        xn, _ = pend.step(x, u, 0.01)
        return xn, xn

    xf, _ = jax.lax.scan(roll, x0, None, length=400)
    assert float(jnp.linalg.norm(xf - xg)) < 0.1


def test_greedy_and_epsilon():
    pend = PendulumDynamics()
    greedy = GreedyController(Q=jnp.eye(2), R=jnp.eye(1), dt=0.01,
                              x_goal=jnp.zeros(2))
    u = greedy.control_with_model(pend.f_func, pend.g_func,
                                  jnp.array([0.3, -0.1]), 0)
    assert u.shape == (1,)
    eg = EpsilonGreedyController(numSteps=100, ctrl_range=(-5.0, 5.0))
    up = eg.perturb(u, 0, jax.random.PRNGKey(0))
    assert abs(float(up[0])) <= 5.0
    z = ZeroController(u_dim=2)
    np.testing.assert_allclose(np.asarray(z.control(jnp.zeros(3), 0)), 0.0)


def test_pid_controller():
    pid = PIDController()
    u = pid.control(jnp.array([-1.0, -1.0, 0.0]), jnp.zeros(3))
    assert u.shape == (2,)
    assert np.isfinite(np.asarray(u)).all()


def test_planners():
    x0 = jnp.array([-3.0, -1.0, -math.pi / 4])
    xg = jnp.array([0.0, 0.0, math.pi / 4])
    pw = PiecewiseLinearPlanner.create(x0, xg, 100, 0.01)
    p0 = pw.plan(0)
    pT = pw.plan(100)
    assert np.linalg.norm(np.asarray(pT[:2]) - np.asarray(xg[:2])) < 1e-9
    d0 = pw.dot_plan(0)
    assert np.isfinite(np.asarray(d0)).all()
    sp = SplinePlanner.create(x0, xg, 100, 0.01)
    # spline interpolates the endpoints
    np.testing.assert_allclose(np.asarray(sp.plan(0.0)), np.asarray(x0),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(sp.plan(100.0)), np.asarray(xg),
                               atol=1e-8)
    npl = NoPlanner.create(xg)
    np.testing.assert_allclose(np.asarray(npl.plan(13)), np.asarray(xg))


def test_trigger_intervals_shapes():
    T, n, m = 5, 3, 2
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(T, n)))
    Xdot = jnp.asarray(rng.normal(size=(T, n)) * 0.5)
    U = jnp.asarray(rng.normal(size=(T, m)))
    sf = jnp.ones((T,))
    ls = jnp.ones((T, n))
    A = jnp.tile(jnp.eye(n)[None], (T, 1, 1))
    B = jnp.tile(jnp.eye(m + 1)[None], (T, 1, 1))
    tau, tau_num, Lfh, Lfh_num, xvel = trigger_intervals(
        X, Xdot, U, sf, ls, A, B, cbf_grads_max=jnp.asarray(2.0),
        key=jax.random.PRNGKey(0), grid_pts=4)
    assert tau.shape == (T,)
    assert np.all(np.asarray(tau) > 0)
    assert np.all(np.asarray(Lfh) > 0)
    # tau decreases when the Lipschitz bound increases (sanity on formula)
    assert np.all(np.asarray(tau)[np.asarray(Lfh) > np.median(Lfh)].mean()
                  <= np.asarray(tau)[np.asarray(Lfh) <= np.median(Lfh)].mean()
                  + 1e-9)


def test_metrics_logger_roundtrip(tmp_path):
    log = MetricsLogger(runs_dir=str(tmp_path), exp_tags=["unit"],
                        config={"a": 1, "b": [1, 2]})
    log.add_scalar("x", 1.5, 0)
    log.add_scalar("x", 2.5, 1)
    log.close()
    grouped = load_metrics(log.dir)
    assert grouped["x"] == [[0, 1.5], [1, 2.5]] or \
        grouped["x"] == [(0, 1.5), (1, 2.5)]
    assert os.path.exists(os.path.join(log.dir, "config.json"))


def test_checkpoint_roundtrip(tmp_path):
    from bayesian_cbf_tpu.models import make_mvgp
    gp = make_mvgp(2, 1)
    params = gp.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, params)
    params2 = load_checkpoint(path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_fast_controller_matches_gp_path():
    """The closed-form moment cones must reproduce the GP-expression-tree
    controller's output (same SOCP, same u)."""
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    from bayesian_cbf_tpu.control.bayes_controller import (
        bayes_clf_control, bayes_clf_control_gp)
    sim = make_ackermann_tracking_sim(numSteps=50, dt=0.01,
                                      enable_learning=False,
                                      true_L=12.0, mean_L=1.0,
                                      kernel_diag_A=(1e-2,) * 3)
    dyn_state = sim.learned_dynamics.init_state(jax.random.PRNGKey(0))
    x = jnp.asarray(STATE_START)
    t = jnp.asarray(3)
    moments_fn = lambda xx: sim.learned_dynamics.moments(dyn_state, xx)
    fu_gp_fn = lambda u: sim.learned_dynamics.fu_func_gp(dyn_state, u)
    u_fast, info_fast = jax.jit(lambda x, t: bayes_clf_control(
        sim.controller, sim.clf, sim.cbfs, sim.planner, moments_fn, x, t))(
            x, t)
    u_gp, info_gp = jax.jit(lambda x, t: bayes_clf_control_gp(
        sim.controller, sim.clf, sim.cbfs, sim.planner, fu_gp_fn, x, t))(
            x, t)
    np.testing.assert_allclose(np.asarray(u_fast), np.asarray(u_gp),
                               rtol=1e-3, atol=1e-4)
    # (info.clc_mean is reported at u=0 on the fast path and at the
    # extraction point u0 on the GP path; only the controls must agree)
    np.testing.assert_allclose(float(info_fast.relax),
                               float(info_gp.relax), rtol=1e-3, atol=1e-4)


def test_racecar_env():
    """RacecarEnv equivalent (bulletcar/racecar.py:39-137): reference
    interface, motor/servo lag, and kinematic consistency."""
    from bayesian_cbf_tpu.models.racecar import RacecarDynamics, RacecarEnv
    env = RacecarEnv(obstacle_centers=[(2.0, 0.0)], obstacle_radii=[0.5])
    assert env.state_size == 3 and env.ctrl_size == 2
    env.set_init_state(jnp.asarray([0.0, 0.0, 0.0]))
    # full throttle straight: x advances, y/theta stay ~0
    for _ in range(100):
        obs = env.step(jnp.asarray([1.0, 0.0]), 0.01)
    x = np.asarray(obs["x"])
    assert x[0] > 0.5 and abs(x[1]) < 1e-6 and abs(x[2]) < 1e-6
    # speed saturates at max_speed (motor lag + drag keep it below)
    assert float(np.asarray(obs["xdot"])[0]) <= env.dynamics.max_speed
    # steering turns the car
    env.set_init_state(jnp.asarray([0.0, 0.0, 0.0]))
    for _ in range(150):
        obs = env.step(jnp.asarray([0.6, 0.8]), 0.01)
    assert abs(float(np.asarray(obs["x"])[2])) > 0.3
    # functional core scans (differentiable env)
    dyn = RacecarDynamics()
    s0 = dyn.init_state(jnp.zeros(3))

    def roll(s, _):
        s, xdot = dyn.step(s, jnp.asarray([0.5, 0.1]), 0.01)
        return s, xdot

    sT, xdots = jax.lax.scan(roll, s0, None, length=50)
    assert bool(jnp.all(jnp.isfinite(xdots)))


def test_carworld_renders(tmp_path):
    """CarWorld/CarWithObstacles equivalent (car/vis.py:10-66) renders
    headlessly."""
    from bayesian_cbf_tpu.observability.carworld import (
        CarWithObstacles, render_car_trajectory)
    w = CarWithObstacles()
    w.setGoal(3.0, 1.0)
    w.addObstacle(1.5, 0.5, 0.4)
    w.setCarPose(0.0, 0.0, 0.3)
    out = w.show(savefile=str(tmp_path / "scene.png"))
    import os.path as osp
    assert osp.getsize(out) > 1000
    w.close()
    X = np.stack([np.linspace(0, 3, 30), np.linspace(0, 1, 30),
                  np.full(30, 0.3)], -1)
    gif = render_car_trajectory(X, obstacles=[(1.5, 0.5, 0.4)],
                                goal=(3.0, 1.0),
                                savefile=str(tmp_path / "car.gif"))
    assert osp.getsize(gif) > 1000


def test_checkpoint_mismatch_raises(tmp_path):
    """A checkpoint restored into the wrong pytree must raise, not
    silently reshape (round-2 VERDICT weak #8): wrong leaf count, wrong
    leaf shapes, and wrong treedef all get useful errors."""
    import pytest
    from bayesian_cbf_tpu.models import make_mvgp
    gp = make_mvgp(2, 1)
    params = gp.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, params)
    # wrong leaf count
    with pytest.raises(ValueError, match="leaves"):
        load_checkpoint(path, {"a": np.zeros(3)})
    # same leaf count, different shapes
    n = len(jax.tree.leaves(params))
    bad_like = {("k%d" % i): np.zeros((2, 2)) for i in range(n)}
    with pytest.raises(ValueError, match="shape|structure"):
        load_checkpoint(path, bad_like)
    # manifest records the saving package version
    import json as _json
    with open(path + ".tree") as f:
        man = _json.load(f)
    assert "version" in man and "treedef" in man
    # legacy sidecar (plain str(treedef)) still loads
    with open(path + ".tree", "w") as f:
        f.write("PyTreeDef(legacy)")
    params2 = load_checkpoint(path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_realized_cbc_margins_nonnegative_on_feasible_steps():
    """Weak-9 audit (f64): every solver-feasible step's applied control
    must satisfy each CBC chance cone — realized margin >= -1e-5 — and
    the audit math must be the controller's own (shared
    constraint_cone_terms).  Static-GP config so the audit posterior is
    exactly the in-scan posterior."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bayesian_cbf_tpu.experiments.unicycle import (
        unicycle_bayes_cbf_safe_obstacle, realized_cbc_margins)
    sim, out = unicycle_bayes_cbf_safe_obstacle(numSteps=60, dt=0.01)
    mg = np.asarray(realized_cbc_margins(sim, out))
    feas = np.asarray(out.info.feasible) > 0.5
    assert feas.any()
    assert np.all(np.isfinite(mg))
    assert mg[feas].min() > -1e-5, mg[feas].min()
