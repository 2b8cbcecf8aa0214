"""L7 — reference-trajectory planners.

Parity: bayes_cbf/planner.py (PiecewiseLinearPlanner, SplinePlanner) and
NoPlanner (unicycle_move_to_pose.py:1522-1530).  The planners are
jit-friendly: all checkpoint data is computed at construction (concrete),
and `plan(t)` / `dot_plan(t)` are pure functions of a traced step index.

The spline planner replaces scipy splrep/splev with a natural cubic spline
solved at construction (tridiagonal system) and evaluated in-graph.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PiecewiseLinearPlanner(NamedTuple):
    """Two-checkpoint piecewise-linear plan in (x, y, cos th, sin th) space
    with a 10%-of-horizon lookahead (planner.py:19-64)."""
    p0: jax.Array          # (4,) start in embedded space
    cps_t: jax.Array       # (2,) checkpoint steps
    cps_x: jax.Array       # (2, 4) checkpoint embedded states
    numSteps: int
    dt: float

    @classmethod
    def create(cls, x0, x_goal, numSteps, dt,
               frac_time_to_reach_goal=0.7):
        x0 = jnp.asarray(x0); x_goal = jnp.asarray(x_goal)
        assert numSteps >= 3
        xdiff = x_goal[:2] - x0[:2]
        xdiff_n = xdiff / jnp.linalg.norm(xdiff)
        t2 = min(int(numSteps * frac_time_to_reach_goal), numSteps - 1)
        cp1 = jnp.concatenate([x_goal[:2], xdiff_n])
        cp2 = jnp.concatenate([x_goal[:2], jnp.cos(x_goal[2:]),
                               jnp.sin(x_goal[2:])])
        p0 = jnp.concatenate([x0[:2], jnp.cos(x0[2:]), jnp.sin(x0[2:])])
        return cls(p0=p0, cps_t=jnp.array([t2, numSteps], dtype=x0.dtype),
                   cps_x=jnp.stack([cp1, cp2]), numSteps=numSteps, dt=dt)

    def _target_step(self, t):
        look = max(int(0.1 * self.numSteps), 1)
        return jnp.minimum(t + look, self.numSteps)

    def _interval(self, ts):
        """Select (prev_t, prev_x, cp_t, cp_x) for target step ts."""
        in_first = ts <= self.cps_t[0]
        prev_t = jnp.where(in_first, 0.0, self.cps_t[0])
        prev_x = jnp.where(in_first, self.p0, self.cps_x[0])
        cp_t = jnp.where(in_first, self.cps_t[0], self.cps_t[1])
        cp_x = jnp.where(in_first, self.cps_x[0], self.cps_x[1])
        return prev_t, prev_x, cp_t, cp_x

    def plan(self, t):
        ts = self._target_step(t)
        prev_t, prev_x, cp_t, cp_x = self._interval(ts)
        xp = (cp_x - prev_x) * (ts - prev_t) / (cp_t - prev_t) + prev_x
        return jnp.concatenate([xp[:2],
                                jnp.arctan2(xp[3:4], xp[2:3])])

    def dot_plan(self, t):
        """NOTE: reproduces the reference's angular-rate expression
        (planner.py:61-64) exactly — including its (cdot - sdot) numerator —
        for trajectory parity."""
        ts = self._target_step(t)
        prev_t, prev_x, cp_t, cp_x = self._interval(ts)
        xdiff = (cp_x - prev_x) / ((cp_t - prev_t) * self.dt)
        wterm = (xdiff[2:3] - xdiff[3:4]) / jnp.sum(xdiff[2:4] ** 2)
        return jnp.concatenate([xdiff[:2], wterm])


class NoPlanner(NamedTuple):
    """Constant-goal plan (unicycle_move_to_pose.py:1522-1530)."""
    x_goal: jax.Array

    @classmethod
    def create(cls, x_goal, *a, **kw):
        return cls(x_goal=jnp.asarray(x_goal))

    def plan(self, t):
        return self.x_goal

    def dot_plan(self, t):
        return jnp.zeros_like(self.x_goal)


def _natural_cubic_coeffs(ts: np.ndarray, ys: np.ndarray):
    """Natural cubic spline second-derivatives at knots (numpy, setup-time)."""
    n = len(ts)
    h = np.diff(ts)
    A = np.zeros((n, n))
    rhs = np.zeros(n)
    A[0, 0] = A[-1, -1] = 1.0
    for i in range(1, n - 1):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
        rhs[i] = 3 * ((ys[i + 1] - ys[i]) / h[i]
                      - (ys[i] - ys[i - 1]) / h[i - 1])
    c = np.linalg.solve(A, rhs)
    b = (np.diff(ys) / h) - h * (2 * c[:-1] + c[1:]) / 3
    d = np.diff(c) / (3 * h)
    return b, c[:-1], d


class SplinePlanner(NamedTuple):
    """Cubic-spline plan through 7 knots (planner.py:66-110), natural cubic
    spline instead of scipy splrep (solved once at construction)."""
    knots_t: jax.Array    # (K,)
    knots_y: jax.Array    # (K, 3)  values at knots
    coef_b: jax.Array     # (K-1, 3)
    coef_c: jax.Array
    coef_d: jax.Array
    numSteps: int
    dt: float

    @classmethod
    def create(cls, x0, x_goal, numSteps, dt):
        x0 = np.asarray(x0, dtype=np.float64)
        x_goal = np.asarray(x_goal, dtype=np.float64)
        xdiff = x_goal[:2] - x0[:2]
        desired_theta = np.arctan2(xdiff[1], xdiff[0])
        t1 = max(int(numSteps * 0.1), 1)
        t2 = min(int(numSteps * 0.9), numSteps - 1)
        dx = (x_goal - x0) / (t2 - t1)
        tmid = (t1 + t2) / 2
        xmid = (x0 + x_goal) / 2
        knots = np.array([
            [0, x0[0], x0[1], x0[2]],
            [t1, x0[0], x0[1], desired_theta],
            [t1 + 1, x0[0] + dx[0], x0[1] + dx[1], desired_theta],
            [tmid, xmid[0], xmid[1], desired_theta],
            [t2 - 1, x_goal[0] - dx[0], x_goal[1] - dx[1], desired_theta],
            [t2, x_goal[0], x_goal[1], desired_theta],
            [numSteps, x_goal[0], x_goal[1], x_goal[2]]])
        ts, ys = knots[:, 0], knots[:, 1:]
        bs, cs, ds = [], [], []
        for j in range(3):
            b, cc, d = _natural_cubic_coeffs(ts, ys[:, j])
            bs.append(b); cs.append(cc); ds.append(d)
        return cls(knots_t=jnp.asarray(ts), knots_y=jnp.asarray(ys),
                   coef_b=jnp.asarray(np.stack(bs, -1)),
                   coef_c=jnp.asarray(np.stack(cs, -1)),
                   coef_d=jnp.asarray(np.stack(ds, -1)),
                   numSteps=numSteps, dt=dt)

    def _segment(self, t):
        idx = jnp.clip(jnp.searchsorted(self.knots_t, t, side="right") - 1,
                       0, self.knots_t.shape[0] - 2)
        return idx, t - self.knots_t[idx]

    def plan(self, t):
        i, u = self._segment(jnp.asarray(t, self.knots_y.dtype))
        return (self.knots_y[i] + self.coef_b[i] * u
                + self.coef_c[i] * u ** 2 + self.coef_d[i] * u ** 3)

    def dot_plan(self, t):
        i, u = self._segment(jnp.asarray(t, self.knots_y.dtype))
        return (self.coef_b[i] + 2 * self.coef_c[i] * u
                + 3 * self.coef_d[i] * u ** 2)
