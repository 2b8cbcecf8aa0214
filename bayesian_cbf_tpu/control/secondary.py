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
    """Cholesky solve for SMALL PD systems (TPU: f64 LU unsupported).

    Statically unrolled: these solves run per scan step (LQR Riccati
    backpass, greedy controller) where an XLA `cholesky` custom call on
    a 2x2/4x4 is a latency-bound op (same finding as the 3x3 task-matrix
    ladder in the MLL, round-3 profiler trace)."""
    from ..utils.linalg import chol_small_unrolled, cho_solve_small_unrolled
    L = chol_small_unrolled(A)
    x = cho_solve_small_unrolled(L, b[..., :, None] if b.ndim == A.ndim - 1
                                 else b)
    return x[..., 0] if b.ndim == A.ndim - 1 else x


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
        # in-graph failure handling (SURVEY 5.3): a large (finite)
        # learned jacobian overflows the horizon-step Riccati recursion
        # in f32 (P ~ |A|^(2H)); clip passes NaN through, so an
        # un-linearizable model falls back to the zero reference — the
        # SOCP's safety cones still act on it downstream
        u = jnp.where(jnp.all(jnp.isfinite(u)), u, jnp.zeros_like(u))
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
    """Finite-horizon iLQR via the reference's affine backpropagation
    (bayes_cbf/ilqr.py:43-76,126-190):

    cost  sum_t  u_t^T R u_t + 2 z^T u_t + x_t^T Q x_t + 2 s^T x_t,
    s = -Q x_goal (so the state terms equal (x - x_g)^T Q (x - x_g) up to a
    constant), z = 0.  Backward affine recursion with value function
    x^T P x + 2 o^T x:

        G = R + B^T P B,       K = G^{-1} B^T P A,
        P' = Q + A^T P A - A^T P B K,
        o' = s + A^T o - K^T (z + B^T o),   k = G^{-1} (z + B^T o),

    optimal u_t = -K_t x_t - k_t; forward pass rolls the *nonlinear*
    dynamics under the affine policy; `lqr_iter` refinement rounds
    relinearize along the new trajectory (ilqr.py:171-185).  The initial
    trajectory linearizes every step at (x0, u0=1) exactly as the
    reference's cold start (ilqr.py:173-177)."""
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
        s = -Q @ xg
        z = jnp.zeros((m,), dtype)
        lo = jnp.asarray(self.ctrl_range[0], dtype)
        hi = jnp.asarray(self.ctrl_range[1], dtype)

        def dyn(x, u):
            return x + self.dt * (f_func(x) + g_func(x) @ u)

        def linearize(x, u):
            A = jax.jacfwd(lambda xx: dyn(xx, u))(x)
            B = self.dt * g_func(x)
            return A, B

        def backward(xs, us):
            As, Bs = jax.vmap(linearize)(xs, us)

            def bstep(carry, AB):
                P, o = carry
                A, B = AB
                BtP = B.T @ P
                G = R + BtP @ B
                Bto = B.T @ o
                K = _solve_pd(G, BtP @ A)
                k = _solve_pd(G, z + Bto)
                P_new = Q + A.T @ P @ A - A.T @ P @ B @ K
                o_new = s + A.T @ o - K.T @ (z + Bto)
                return (P_new, o_new), (K, k)

            _, (Ks, ks) = jax.lax.scan(bstep, (Q, s), (As, Bs),
                                       reverse=True)
            return Ks, ks

        def forward(Ks, ks):
            def fstep(x, Kk):
                K, k = Kk
                u = clip_vec(-K @ x - k, lo, hi)
                return dyn(x, u), (x, u)

            _, (xs, us) = jax.lax.scan(fstep, x0, (Ks, ks))
            return xs, us

        # cold start: linearize the whole horizon at (x0, u0 = 1)
        xs = jnp.broadcast_to(x0, (self.horizon, n))
        us = jnp.ones((self.horizon, m), dtype)
        Ks, ks = backward(xs, us)

        def refine(carry, _):
            Ks, ks = carry
            xs, us = forward(Ks, ks)
            Ks, ks = backward(xs, us)
            return (Ks, ks), None

        (Ks, ks), _ = jax.lax.scan(refine, (Ks, ks), None,
                                   length=self.lqr_iter)
        return clip_vec(-Ks[0] @ x0 - ks[0], lo, hi)
