"""Secondary / reference controllers.

Parity: LQRController, ZeroController, GreedyController,
EpsilonGreedyController (bayes_cbf/controllers.py:64-285), ControllerPID
(unicycle_move_to_pose.py:1001-1027), and a finite-horizon iLQR
(bayes_cbf/ilqr.py) — all pure functions / NamedTuple configs, jit-safe.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils.func import clip_vec, epsilon_interp
from .clf_cbf import cartesian2polar


def _solve_pd(A, b):
    """Cholesky solve for PD systems (TPU: f64 LU is unsupported)."""
    L = jnp.linalg.cholesky(A)
    return jax.scipy.linalg.cho_solve((L, True), b)


class ZeroController(NamedTuple):
    """u = 0 (controllers.py:166-171)."""
    u_dim: int = 1

    def control(self, x, t):
        return jnp.zeros((self.u_dim,), x.dtype)


class GreedyController(NamedTuple):
    """One-step greedy quadratic controller (controllers.py:174-213):
    minimize (x+dt*xdot(u) - x_g)^T Q (x+dt*xdot(u) - x_g) + u^T R u
    which is a closed-form least squares in u."""
    Q: jax.Array
    R: jax.Array
    x_goal: jax.Array
    dt: float
    ctrl_range: Tuple[float, float] = (-15.0, 15.0)

    def control_with_model(self, f_func, g_func, x, t):
        fx = f_func(x)
        Gx = g_func(x)
        # d/du [ (x + dt (f + G u) - xg)^T Q (...) + u^T R u ] = 0
        xt = x + self.dt * fx - self.x_goal
        Gs = self.dt * Gx
        H = Gs.T @ self.Q @ Gs + self.R
        rhs = -Gs.T @ self.Q @ xt
        u = _solve_pd(H + 1e-9 * jnp.eye(H.shape[0], dtype=x.dtype), rhs)
        return clip_vec(u, jnp.asarray(self.ctrl_range[0], x.dtype),
                        jnp.asarray(self.ctrl_range[1], x.dtype))


class LQRController(NamedTuple):
    """Linearize the (learned) dynamics at x, solve a finite-horizon
    discrete LQR by Riccati backward recursion, apply the first gain
    (controllers.py:64-115, replacing the external `bdlqr` solve with an
    in-graph lax.scan Riccati sweep)."""
    Q: jax.Array            # (n, n) state cost
    R: jax.Array            # (m, m) control cost
    x_goal: jax.Array       # (n,)
    horizon: int
    dt: float
    ctrl_range: Tuple[float, float] = (-15.0, 15.0)

    def control_with_model(self, f_func, g_func, x, t):
        n = x.shape[-1]
        # discrete linearization around x: x+ = x + dt (f + G u)
        # => A = I + dt df/dx, B = dt G
        A = jnp.eye(n, dtype=x.dtype) + self.dt * jax.jacfwd(f_func)(x)
        B = self.dt * g_func(x)
        Q, R = self.Q.astype(x.dtype), self.R.astype(x.dtype)

        def riccati(P, _):
            BtP = B.T @ P
            K = _solve_pd(R + BtP @ B, BtP @ A)
            P = Q + A.T @ P @ (A - B @ K)
            return P, K

        P0 = Q
        _, Ks = jax.lax.scan(riccati, P0, None, length=self.horizon)
        K = Ks[-1]   # gain at the current (first) step
        u = -K @ (x - self.x_goal.astype(x.dtype))
        return clip_vec(u, jnp.asarray(self.ctrl_range[0], x.dtype),
                        jnp.asarray(self.ctrl_range[1], x.dtype))


class EpsilonGreedyController(NamedTuple):
    """Exploration wrapper: u = u_inner + eps(t) * uniform(ctrl_range),
    eps log-interpolated over the horizon (controllers.py:268-285,
    misc.py:261-265)."""
    numSteps: int
    egreedy_scheme: Tuple[float, float] = (1.0, 0.01)
    ctrl_range: Tuple[float, float] = (-15.0, 15.0)

    def perturb(self, u, t, key):
        eps = epsilon_interp(
            t, (0, self.egreedy_scheme[0]),
            (self.numSteps, self.egreedy_scheme[1])).astype(u.dtype)
        lo = jnp.asarray(self.ctrl_range[0], u.dtype)
        hi = jnp.asarray(self.ctrl_range[1], u.dtype)
        randomact = jax.random.uniform(key, u.shape, u.dtype, lo, hi)
        return clip_vec(u + eps * randomact, lo, hi)


class PIDController(NamedTuple):
    """Polar-coordinates P controller for the unicycle
    (unicycle_move_to_pose.py:1001-1027)."""
    Kp_rho: float = 9.0
    Kp_alpha: float = -15.0
    Kp_beta: float = -3.0

    def control(self, x, state_goal):
        rho, alpha, beta = cartesian2polar(x, state_goal)
        v = self.Kp_rho * rho
        w = self.Kp_alpha * alpha + self.Kp_beta * beta
        v = jnp.where(jnp.abs(alpha) > math.pi / 2, -v, v)
        return jnp.stack([v, w])


class ILQRController(NamedTuple):
    """Finite-horizon iLQR (bayes_cbf/ilqr.py:19-190): iterate
    (linearize along trajectory -> Riccati backward -> rollout forward),
    box-clipped controls, fixed iteration count for jit."""
    Q: jax.Array
    R: jax.Array
    x_goal: jax.Array
    horizon: int
    dt: float
    lqr_iter: int = 3
    ctrl_range: Tuple[float, float] = (-15.0, 15.0)

    def control_with_model(self, f_func, g_func, x0, t):
        n = x0.shape[-1]
        m = self.R.shape[0]
        dtype = x0.dtype
        Q, R = self.Q.astype(dtype), self.R.astype(dtype)
        xg = self.x_goal.astype(dtype)
        lo = jnp.asarray(self.ctrl_range[0], dtype)
        hi = jnp.asarray(self.ctrl_range[1], dtype)

        def dyn(x, u):
            return x + self.dt * (f_func(x) + g_func(x) @ u)

        def rollout(us):
            def step(x, u):
                xn = dyn(x, u)
                return xn, x
            _, xs = jax.lax.scan(step, x0, us)
            return xs

        def ilqr_iter(us, _):
            xs = rollout(us)

            def linearize(x, u):
                A = jax.jacfwd(lambda xx: dyn(xx, u))(x)
                B = jax.jacfwd(lambda uu: dyn(x, uu))(u)
                return A, B

            As, Bs = jax.vmap(linearize)(xs, us)

            def backward(P, AB):
                A, B, x = AB
                BtP = B.T @ P
                K = _solve_pd(R + BtP @ B, BtP @ A)
                P = Q + A.T @ P @ (A - B @ K)
                return P, (K,)

            _, (Ks,) = jax.lax.scan(
                backward, Q, (As, Bs, xs), reverse=True)

            def forward(x, KU):
                K, u_old, x_old = KU
                u = clip_vec(u_old - K @ (x - x_old) - 0.1 * K @ (x - xg),
                             lo, hi)
                return dyn(x, u), u

            _, us_new = jax.lax.scan(forward, x0, (Ks, us, xs))
            return us_new, None

        us0 = jnp.zeros((self.horizon, m), dtype)
        us, _ = jax.lax.scan(ilqr_iter, us0, None, length=self.lqr_iter)
        return us[0]
