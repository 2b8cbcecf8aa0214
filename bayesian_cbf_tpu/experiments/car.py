"""Car experiments: MVGP dynamics learning on the second-order unicycle and
a ground-truth CBC2 QP demo with circular obstacles.

Parity: bayes_cbf/car/core.py:227-306 (learn_dynamics,
run_car_control_ground_truth) on the 6-state UnicycleDynamicsModel; the
HyundaiGenesis variant uses the same machinery with the 9-state model.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.car import (CircularObstacleCBC, HyundaiGenesisDynamics,
                          SecondOrderUnicycle)
from ..models.mvgp import make_mvgp_rank1
from ..solvers.socp import solve_socp


def sample_car_data(key, numSteps=500, dt=0.01):
    """Random-control rollout of the 6-state unicycle
    (car ControlRandom, car/core.py:163-168: accel + random heading)."""
    car = SecondOrderUnicycle()

    def step(carry, _):
        x, k = carry
        k, ka, ks = jax.random.split(k, 3)
        a = jax.random.uniform(ka, ())
        s = jax.random.uniform(ks, (), minval=-math.pi, maxval=math.pi)
        u = jnp.stack([a, s])
        xdot = car.f_func(x) + car.g_func(x) @ u
        x_next, _ = car.step(x, u, dt)
        return (x_next, k), (x, u, xdot)

    x0 = jnp.zeros((6,))
    (_, _), (X, U, Xdot) = jax.lax.scan(step, (x0, key), None,
                                        length=numSteps)
    return X, U, Xdot


def car_learn_dynamics(max_train=100, training_iter=40, seed=0):
    """Fit the MVGP to car rollout data and report held-out xdot RMSE
    (car/core.py learn_dynamics)."""
    X, U, Xdot = sample_car_data(jax.random.PRNGKey(seed))
    gp = make_mvgp_rank1(6, 2)
    params = gp.init_params(jax.random.PRNGKey(seed))
    data = gp.make_data(X[:max_train], U[:max_train], Xdot[:max_train])
    params = jax.jit(lambda p, d: gp.fit(p, d,
                                         training_iter=training_iter))(
        params, data)
    cache = gp.refresh_cache(params, data)
    Xe, Ue, Xde = X[max_train:max_train + 100], U[max_train:max_train + 100], \
        Xdot[max_train:max_train + 100]
    pred = jax.vmap(lambda x, u: gp.fu_mean(params, data, cache, u, x))(
        Xe, Ue)
    rmse = jnp.sqrt(jnp.mean((pred - Xde) ** 2))
    return gp, params, data, cache, float(rmse)


def run_car_control_ground_truth(numSteps=300, dt=0.01,
                                 centers=((1.0, 1.0), (1.0, -1.0),
                                          (-1.0, -1.0), (-1.0, 1.0)),
                                 radii=(0.8,) * 4,
                                 x_goal=(0.0, 0.0), socp_iters=20):
    """Ground-truth rel-deg-2 CBC QP on the 6-state unicycle with four
    circular obstacles (run_car_control_ground_truth, car/core.py:296-306):
    greedy goal-seeking reference control filtered by the CBC2 constraints
        A_k(x) u <= b_k(x)   (hard, per obstacle)
    via min ||u - u_ref||^2."""
    car = SecondOrderUnicycle()
    cbcs = [CircularObstacleCBC(center=jnp.asarray(c), radius=r,
                                pos_idx=(3, 4)) for c, r in zip(centers,
                                                                radii)]
    xg = jnp.asarray(x_goal)

    def u_ref_fn(x):
        # accelerate toward the goal, damp rotation
        d = xg - x[3:5]
        heading = jnp.arctan2(d[1], d[0])
        a = jnp.clip(jnp.linalg.norm(d) - jnp.linalg.norm(x[:2]), -2.0, 2.0)
        alpha = jnp.clip(2.0 * (heading - x[5]) - x[2], -2.0, 2.0)
        return jnp.stack([a, alpha])

    def control(x):
        m = 2
        nvar = m + 1     # [u, t]
        dtype = x.dtype
        uref = u_ref_fn(x)
        Gs, hs, dims = [], [], []
        A = jnp.zeros((m + 1, nvar), dtype)
        A = A.at[:m, :m].set(2.0 * jnp.eye(m, dtype=dtype))
        A = A.at[m, m].set(1.0)
        b = jnp.concatenate([-2.0 * uref, -jnp.ones((1,), dtype)])
        cvec = jnp.zeros((nvar,), dtype).at[m].set(1.0)
        Gs.append(jnp.concatenate([-cvec[None, :], -A], 0))
        hs.append(jnp.concatenate([jnp.ones((1,), dtype), b]))
        dims.append(m + 2)
        for cbc in cbcs:
            coef = jnp.zeros((nvar,), dtype).at[:m].set(-cbc.A(car, x))
            Gs.append(-coef[None, :])
            hs.append(jnp.reshape(cbc.b(car, x), (1,)))
            dims.append(1)
        cobj = jnp.zeros((nvar,), dtype).at[m].set(1.0)
        sol = solve_socp(cobj, jnp.concatenate(Gs, 0),
                         jnp.concatenate(hs, 0), tuple(dims),
                         iters=socp_iters)
        ok = (sol.pres < 1e-4) & jnp.all(jnp.isfinite(sol.x))
        return jnp.where(ok, sol.x[:m], jnp.zeros((m,), dtype)), sol.pres

    def step(x, _):
        u, pres = control(x)
        x_next, _ = car.step(x, u, dt)
        return x_next, (x, u, pres)

    x0 = jnp.zeros((6,)).at[3].set(-2.5).at[4].set(-2.5)
    _, (X, U, pres) = jax.lax.scan(step, x0, None, length=numSteps)
    return cbcs, X, U, pres


def min_car_clearance(cbcs, X):
    ds = []
    for cbc in cbcs:
        d = jnp.linalg.norm(X[:, 3:5] - cbc.center[None], axis=-1)
        ds.append(jnp.min(d) - cbc.radius)
    return jnp.stack(ds)
