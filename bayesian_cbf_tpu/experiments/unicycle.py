"""L9 — the four README unicycle experiments.

Parity targets (configs at unicycle_move_to_pose.py:1888-2012):
  * unicycle_mean_cbf_collides_obstacle   — max_risk=0.5, no learning,
      true L=12 / prior L=1, kernel_diag_A=1e-2  -> collides
  * unicycle_bayes_cbf_safe_obstacle      — same but max_risk=0.01 -> safe
  * unicycle_learning_helps_avoid_getting_stuck — max_risk=0.01, learning
      every 400 steps, true L=1 / prior L=12 -> passes
  * unicycle_no_learning_gets_stuck       — train_every=2000 (never) -> stuck

All use: start [-3, -1, -pi/4], goal [0, 0, pi/4], dt=0.001, 2000 steps,
two obstacles flanking the midpoint (term_weights=[0.7, 0.3]),
cbf_gammas=[5, 5], CLFCartesian Kp=[0.9, 1.5, 0],
PiecewiseLinearPlanner frac=0.95 (:1704-1706, 1891-1906).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..control.bayes_controller import BayesCLFControllerConfig
from ..control.clf_cbf import (CLFCartesian,
                               obstacles_at_mid_from_start_and_goal)
from ..control.planner import PiecewiseLinearPlanner
from ..models.dynamics import AckermannDrive, LearnedShiftInvariantDynamics
from ..models.mvgp import make_mvgp_rank1
from ..sim.rollout import UnicycleSim, simulate_unicycle

STATE_START = (-3.0, -1.0, -math.pi / 4)
STATE_GOAL = (0.0, 0.0, math.pi / 4)


def make_ackermann_tracking_sim(
        x0=STATE_START, x_goal=STATE_GOAL,
        dt: float = 0.001, numSteps: int = 2000,
        true_L: float = 1.0, mean_L: float = 12.0,
        kernel_diag_A=(1.0, 1.0, 1.0),
        max_risk: float = 0.01,
        enable_learning: bool = True,
        train_every_n_steps: int = 400,
        max_train: int = 200,
        training_iter: int = 100,
        term_weights=(0.7, 0.3),
        cbf_gammas=(5.0, 5.0),
        Kp=(0.9, 1.5, 0.0),
        frac_time_to_reach_goal: float = 0.95,
        socp_iters: int = 25,
        warm_start: bool = False,
        socp_iters_warm: int = 15,
        training_iter_warm: int = 0,
        first_fit_coarse_stride: int = 0,
        first_fit_refine_iter: int = 15) -> UnicycleSim:
    """track_trajectory_ackerman_clf_bayesian equivalent
    (unicycle_move_to_pose.py:1689-1734)."""
    x0 = jnp.asarray(x0)
    x_goal = jnp.asarray(x_goal)
    cbfs = tuple(obstacles_at_mid_from_start_and_goal(
        x0, x_goal, term_weights=term_weights))
    planner = PiecewiseLinearPlanner.create(
        x0, x_goal, numSteps, dt,
        frac_time_to_reach_goal=frac_time_to_reach_goal)
    learned = LearnedShiftInvariantDynamics(
        gp=make_mvgp_rank1(3, 2),
        mean_dynamics=AckermannDrive(L=mean_L, kernel_diag_A=kernel_diag_A),
        max_train=max_train, training_iter=training_iter,
        shift_invariant=True, train_every_n_steps=train_every_n_steps,
        enable_learning=enable_learning, dt=dt,
        training_iter_warm=training_iter_warm,
        first_fit_coarse_stride=first_fit_coarse_stride,
        first_fit_refine_iter=first_fit_refine_iter)
    controller = BayesCLFControllerConfig(
        u_dim=2, clf_gamma=10.0, cost_weights=(0.33, 0.33, 0.33),
        ctrl_ref=(0.0, 0.0), max_risk=max_risk, cbf_gammas=cbf_gammas,
        socp_iters=socp_iters, warm_start=warm_start,
        socp_iters_warm=socp_iters_warm)
    return UnicycleSim(
        true_dynamics=AckermannDrive(L=true_L),
        learned_dynamics=learned, controller=controller,
        clf=CLFCartesian(Kp=Kp), cbfs=cbfs, planner=planner,
        dt=dt, numSteps=numSteps)


def _run(sim: UnicycleSim, x0=STATE_START, seed: int = 0):
    return simulate_unicycle(sim, jnp.asarray(x0), jax.random.PRNGKey(seed))


def unicycle_mean_cbf_collides_obstacle(**kw):
    """Mean-CBF (risk 0.5) with a wrong prior: collides
    (unicycle_move_to_pose.py:1889-1913)."""
    kw.setdefault("max_risk", 0.4999)
    kw.setdefault("enable_learning", False)
    kw.setdefault("true_L", 12.0)
    kw.setdefault("mean_L", 1.0)
    kw.setdefault("kernel_diag_A", (1e-2, 1e-2, 1e-2))
    sim = make_ackermann_tracking_sim(**kw)
    return sim, _run(sim)


def unicycle_bayes_cbf_safe_obstacle(**kw):
    """Bayes-CBF (risk 0.01), same wrong prior: stays safe
    (unicycle_move_to_pose.py:1925-1928)."""
    kw.setdefault("max_risk", 0.01)
    kw.setdefault("enable_learning", False)
    kw.setdefault("true_L", 12.0)
    kw.setdefault("mean_L", 1.0)
    kw.setdefault("kernel_diag_A", (1e-2, 1e-2, 1e-2))
    sim = make_ackermann_tracking_sim(**kw)
    return sim, _run(sim)


def unicycle_learning_helps_avoid_getting_stuck(**kw):
    """Learning on (every 400 steps), true L=1 vs prior L=12: passes
    (unicycle_move_to_pose.py:1948-1974)."""
    kw.setdefault("max_risk", 0.01)
    kw.setdefault("enable_learning", True)
    kw.setdefault("train_every_n_steps", 400)
    kw.setdefault("true_L", 1.0)
    kw.setdefault("mean_L", 12.0)
    kw.setdefault("kernel_diag_A", (1.0, 1.0, 1.0))
    sim = make_ackermann_tracking_sim(**kw)
    return sim, _run(sim)


def unicycle_no_learning_gets_stuck(**kw):
    """train_every_n_steps=2000 => never fits within the horizon: gets stuck
    (unicycle_move_to_pose.py:1994-2000)."""
    kw.setdefault("train_every_n_steps", 2000)
    kw.setdefault("max_risk", 0.01)
    kw.setdefault("enable_learning", True)
    kw.setdefault("true_L", 1.0)
    kw.setdefault("mean_L", 12.0)
    kw.setdefault("kernel_diag_A", (1.0, 1.0, 1.0))
    sim = make_ackermann_tracking_sim(**kw)
    return sim, _run(sim)


def unicycle_speed_test(max_train_list=(64, 80, 96, 128), ntimes=10,
                        repeat=5, training_iter=50, seed=0,
                        regressors=("matrix", "vector", "matrixdiag",
                                    "vectordiag"), numSteps=512, dt=0.01):
    """Unicycle twin of the pendulum speed benchmark
    (unicycle_speed_test_matrix_vector, unicycle_move_to_pose.py:2031-2151):
    data from an Ackermann rollout under a CLF controller, test grid over
    the visited states."""
    import numpy as np
    from .pendulum import speed_test_matrix_vector
    sim = make_ackermann_tracking_sim(numSteps=numSteps, dt=dt,
                                      enable_learning=False, true_L=1.0,
                                      mean_L=1.0)
    out = _run(sim, seed=seed)
    X, U = out.X, out.U
    Xdot = out.Xdot
    Xn = np.asarray(X)
    g = 11
    xs = np.linspace(Xn[:, 0].min(), Xn[:, 0].max(), g)
    ys = np.linspace(Xn[:, 1].min(), Xn[:, 1].max(), g)
    th = np.linspace(Xn[:, 2].min(), Xn[:, 2].max(), 4)
    grid = np.stack(np.meshgrid(xs, ys, th), -1).reshape(-1, 3)
    Xtest = jnp.asarray(grid)
    true_dyn = AckermannDrive(L=1.0)
    Ftrue = jax.vmap(lambda x: true_dyn.F_func(x).T.reshape(-1))(Xtest)
    return speed_test_matrix_vector(
        max_train_list=max_train_list, ntimes=ntimes, repeat=repeat,
        training_iter=training_iter, seed=seed, regressors=regressors,
        data=(X, U, Xdot), Xtest=Xtest, Ftrue=Ftrue, x_dim=3, u_dim=2)


def min_obstacle_clearance(sim: UnicycleSim, out):
    """min over time of the radial clearance to each obstacle (collision
    metric: negative => the trajectory entered an obstacle)."""
    ds = []
    for cbf in sim.cbfs:
        d = jnp.linalg.norm(out.X[:, :2] - cbf.center[None, :], axis=-1)
        ds.append(jnp.min(d - cbf.radius))
    return jnp.stack(ds)


def goal_distance(out, x_goal=STATE_GOAL):
    xg = jnp.asarray(x_goal)
    return jnp.linalg.norm(out.X[-1, :2] - xg[:2])


def realized_cbc_margins(sim: UnicycleSim, out, x0=STATE_START,
                         seed: int = 0):
    """Post-hoc audit: realized CBC chance-constraint margins at every
    APPLIED control of a rollout (T, n_cbfs).

    Cross-checks the controller's f32 feasibility gate (relative primal
    residual ~5e-3, control/bayes_controller.py): a step the solver
    marked feasible must actually satisfy each CBC cone at the applied
    u.  Only exact for enable_learning=False sims (static GP state —
    the same posterior the in-scan controller used); with learning the
    margins are evaluated under the INITIAL prior and are advisory.
    Uses `chance_constraint_margins`, which shares its cone math with
    the controller itself (single source of truth)."""
    from ..control.bayes_controller import chance_constraint_margins
    init = sim.init_state(jnp.asarray(x0, out.X.dtype),
                          jax.random.PRNGKey(seed))
    dyn_state = init[1]

    def one(x, u, t):
        mom = sim.learned_dynamics.moments(dyn_state, x)
        mg = chance_constraint_margins(sim.controller, sim.clf, sim.cbfs,
                                       sim.planner, mom, x, t, u)
        return mg[1:]                           # drop the relaxed CLC row

    ts = jnp.arange(out.X.shape[0])
    return jax.jit(jax.vmap(one))(out.X, out.U, ts)
