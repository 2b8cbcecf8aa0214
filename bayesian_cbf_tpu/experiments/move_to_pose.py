"""Classic move-to-pose demos (no learning): CLF-QP in polar/cartesian
coordinates and the PID baseline.

Parity: move_to_pose_clf_polar / move_to_pose_clf_cartesian /
move_to_pose_pid (unicycle_move_to_pose.py:1580-1615) and
track_trajectory_clf_cartesian (:1632-1660) — the deterministic
ControllerCLF stack over the true unicycle.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..control.bayes_controller import (MeanCLFControllerConfig,
                                        mean_clf_control)
from ..control.clf_cbf import (CLFCartesian, CLFPolar, cartesian2polar)
from ..control.planner import NoPlanner, PiecewiseLinearPlanner
from ..control.secondary import PIDController
from ..models.dynamics import CartesianDynamics, PolarDynamics


def move_to_pose_clf_cartesian(x0, x_goal, numSteps=400, dt=0.01,
                               cbfs=(), cbf_gammas=(),
                               Kp=(0.9, 1.5, 0.0), socp_iters=20):
    """CLF-QP on the cartesian unicycle, constant-goal plan
    (move_to_pose_clf_cartesian, unicycle_move_to_pose.py:1593-1605)."""
    dyn = CartesianDynamics()
    clf = CLFCartesian(Kp=Kp)
    planner = NoPlanner.create(jnp.asarray(x_goal))
    cfg = MeanCLFControllerConfig(cbf_gammas=tuple(cbf_gammas),
                                  socp_iters=socp_iters)

    def step(x, t):
        u, sol = mean_clf_control(cfg, clf, cbfs, planner,
                                  dyn.f_func, dyn.g_func, x, t)
        x_next, xdot = dyn.step(x, u, dt)
        return x_next, (x, u, sol.pres)

    _, (X, U, pres) = jax.lax.scan(step, jnp.asarray(x0),
                                   jnp.arange(numSteps))
    return X, U, pres


def track_trajectory_clf_cartesian(x0, x_goal, numSteps=400, dt=0.01,
                                   cbfs=(), cbf_gammas=(),
                                   Kp=(0.9, 1.5, 0.0), socp_iters=20,
                                   frac_time_to_reach_goal=0.7):
    """CLF-QP tracking a piecewise-linear plan
    (track_trajectory_clf_cartesian, unicycle_move_to_pose.py:1632-1660)."""
    dyn = CartesianDynamics()
    clf = CLFCartesian(Kp=Kp)
    planner = PiecewiseLinearPlanner.create(
        jnp.asarray(x0), jnp.asarray(x_goal), numSteps, dt,
        frac_time_to_reach_goal=frac_time_to_reach_goal)
    cfg = MeanCLFControllerConfig(cbf_gammas=tuple(cbf_gammas),
                                  socp_iters=socp_iters)

    def step(x, t):
        u, sol = mean_clf_control(cfg, clf, cbfs, planner,
                                  dyn.f_func, dyn.g_func, x, t)
        x_next, xdot = dyn.step(x, u, dt)
        return x_next, (x, u, sol.pres)

    _, (X, U, pres) = jax.lax.scan(step, jnp.asarray(x0),
                                   jnp.arange(numSteps))
    return X, U, pres


def move_to_pose_clf_polar(x0, x_goal, numSteps=400, dt=0.01,
                           Kp=(0.6, 1.5, 4.0, 0.0), socp_iters=20):
    """CLF-QP in polar coordinates: the controller works on the polar
    state while the world integrates the cartesian unicycle
    (move_to_pose_clf_polar, unicycle_move_to_pose.py:1580-1591)."""
    world = CartesianDynamics()
    polar_dyn = PolarDynamics()
    clf = CLFPolar(Kp=Kp)
    goal = jnp.asarray(x_goal)
    planner = NoPlanner.create(goal)
    cfg = MeanCLFControllerConfig(socp_iters=socp_iters)

    def step(x, t):
        polar = cartesian2polar(x, goal)
        u, sol = mean_clf_control(cfg, clf, (), planner,
                                  polar_dyn.f_func, polar_dyn.g_func,
                                  polar, t)
        x_next, xdot = world.step(x, u, dt)
        return x_next, (x, u, sol.pres)

    _, (X, U, pres) = jax.lax.scan(step, jnp.asarray(x0),
                                   jnp.arange(numSteps))
    return X, U, pres


def move_to_pose_pid(x0, x_goal, numSteps=400, dt=0.01):
    """Polar P controller (move_to_pose_pid,
    unicycle_move_to_pose.py:1607-1615)."""
    world = CartesianDynamics()
    pid = PIDController()
    goal = jnp.asarray(x_goal)

    def step(x, t):
        u = pid.control(x, goal)
        x_next, _ = world.step(x, u, dt)
        return x_next, (x, u)

    _, (X, U) = jax.lax.scan(step, jnp.asarray(x0), jnp.arange(numSteps))
    return X, U
