"""Car environments: second-order unicycle and the 9-state Hyundai Genesis
linear-tire Ackermann model.

Parity targets: bayes_cbf/car/core.py:16-72 (UnicycleDynamicsModel),
bayes_cbf/car/HyundaiGenesis.py:5-248 (HyundaiGenesisDynamicsModel,
StateAsArray, tireLateralForce, controlDelay, updateModel), and
CircularObstacleCBC (car/core.py:92-158).

State layout for the Genesis model (StateAsArray.serialize,
HyundaiGenesis.py:82-88): X = [x, y, theta, vx, vy, w, a, cos d, sin d]
with control U = [accel, cos steer, sin steer].

Note: the reference's UnicycleDynamicsModel.f_func writes rows that
disagree with its own docstring (car/core.py:41-60 indexes v=X[0],
theta=X[4] against the documented [vx, vy, w, x, y, th] layout); we
implement the documented dynamics.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SecondOrderUnicycle(NamedTuple):
    """X = [vx, vy, w, x, y, th], u = [a, alpha]:
    dX = [0,0,0, vx, vy, w] + [[cos th,0],[sin th,0],[0,1],0...] u."""
    state_size: int = 6
    ctrl_size: int = 2

    def f_func(self, X):
        vx, vy, w = X[0], X[1], X[2]
        z = jnp.zeros((), X.dtype)
        return jnp.stack([z, z, z, vx, vy, w])

    def g_func(self, X):
        th = X[5]
        g = jnp.zeros((6, 2), X.dtype)
        g = g.at[0, 0].set(jnp.cos(th))
        g = g.at[1, 0].set(jnp.sin(th))
        g = g.at[2, 1].set(1.0)
        return g

    def F_func(self, X):
        return jnp.concatenate([self.f_func(X)[:, None], self.g_func(X)], 1)

    def step(self, X, u, dt):
        xdot = self.f_func(X) + self.g_func(X) @ u
        return X + xdot * dt, xdot


class HyundaiGenesisParams(NamedTuple):
    """HCE parameters (HyundaiGenesis.py:52-64)."""
    lf: float = 1.5213
    lr: float = 1.4987
    half_width: float = 0.945
    mass: float = 2303.1
    Iz: float = 5520.1
    C_alpha_f: float = 7.6419e4 * 2
    C_alpha_r: float = 13.4851e4 * 2
    accel_tc: float = 0.4
    steer_tc: float = 0.1


class HyundaiGenesisDynamics(NamedTuple):
    """9-state control-affine form of the linear-tire Ackermann car.

    X = [x, y, th, vx, vy, w, a, cd, sd]; U = [accel, cos steer, sin steer].
    f/g per HyundaiGenesis._fg_func (HyundaiGenesis.py:147-178); `step`
    reproduces updateModel's first-order control delay + `disc_steps`
    sub-step Euler integration (:198-218) with the SO(2) pose update."""
    param: HyundaiGenesisParams = HyundaiGenesisParams()
    dt: float = 0.01
    disc_steps: int = 10
    state_size: int = 9
    ctrl_size: int = 3

    def _tire_forces(self, X):
        """Linear tire model; zero below 1 m/s (HyundaiGenesis.py:221-228)."""
        p = self.param
        vx, vy, w = X[3], X[4], X[5]
        steer = jnp.arctan2(X[8], X[7])
        moving = jnp.abs(vx) > 1.0
        alpha_f = jnp.where(moving,
                            steer - jnp.arctan2(vy + p.lf * w, vx), 0.0)
        alpha_r = jnp.where(moving, -jnp.arctan2(vy - p.lr * w, vx), 0.0)
        return p.C_alpha_f * alpha_f, p.C_alpha_r * alpha_r

    def f_func(self, X):
        p = self.param
        th, vx, vy, w = X[2], X[3], X[4], X[5]
        Fyf, Fyr = self._tire_forces(X)
        z = jnp.zeros((), X.dtype)
        return jnp.stack([
            vx * jnp.cos(th) - vy * jnp.sin(th),     # dx
            vx * jnp.sin(th) + vy * jnp.cos(th),     # dy
            w,                                        # dth
            w * vy,                                   # dvx (+ g terms)
            Fyr / p.mass - w * vx,                    # dvy
            -p.lr * Fyr / p.Iz,                       # dw
            z, z, z])                                 # control states via g

    def g_func(self, X):
        p = self.param
        Fyf, _ = self._tire_forces(X)
        g = jnp.zeros((9, 3), X.dtype)
        g = g.at[3].set(jnp.stack([jnp.ones((), X.dtype),
                                   jnp.zeros((), X.dtype),
                                   -Fyf / p.mass]))
        g = g.at[4].set(jnp.stack([jnp.zeros((), X.dtype),
                                   Fyf / p.mass,
                                   jnp.zeros((), X.dtype)]))
        g = g.at[5].set(jnp.stack([jnp.zeros((), X.dtype),
                                   p.lf * Fyf / p.Iz,
                                   jnp.zeros((), X.dtype)]))
        g = g.at[6:9, :].set(jnp.eye(3, dtype=X.dtype))
        return g

    def F_func(self, X):
        return jnp.concatenate([self.f_func(X)[:, None], self.g_func(X)], 1)

    def _control_delay(self, X, U):
        """First-order lag toward the commanded (accel, steer)
        (controlDelay, HyundaiGenesis.py:230-248); returns dU in the
        [da, cos ds, sin ds] encoding."""
        p = self.param
        ad = U[0]
        sd = jnp.arctan2(U[2], U[1])
        a, steer = X[6], jnp.arctan2(X[8], X[7])
        da = self.dt / (self.dt + p.accel_tc) * (ad - a)
        ds = self.dt / (self.dt + p.steer_tc) * (sd - steer)
        return jnp.stack([da, jnp.cos(ds), jnp.sin(ds)])

    def _apply_inc(self, X, dU):
        """AckermannInput.inc_control (HyundaiGenesis.py:35-39)."""
        a = X[6] + dU[0]
        cd, sd = X[7], X[8]
        new_s = sd + dU[2]
        new_c = cd + dU[1]
        ang = jnp.arctan2(new_s, new_c)
        return X.at[6].set(a).at[7].set(jnp.cos(ang)).at[8].set(jnp.sin(ang))

    def step(self, X, U, dt=None):
        """One control period: apply control delay once, then `disc_steps`
        Euler sub-steps of the control-affine dynamics with the held
        internal control (updateModel, HyundaiGenesis.py:198-218)."""
        dt = self.dt if dt is None else dt
        deltaT = dt / self.disc_steps
        X = self._apply_inc(X, self._control_delay(X, U))
        Ut = X[6:9]

        def substep(i, Xc):
            xdot = self.f_func(Xc) + self.g_func(Xc) @ Ut
            Xn = Xc + xdot * deltaT
            # re-normalize the steering encoding on the unit circle
            ang = jnp.arctan2(Xn[8], Xn[7])
            return Xn.at[7].set(jnp.cos(ang)).at[8].set(jnp.sin(ang))

        Xn = jax.lax.fori_loop(0, self.disc_steps, substep, X)
        xdot = (Xn - X) / dt
        return Xn, xdot

    def init_state(self, dtype=jnp.float64):
        X = jnp.zeros((9,), dtype)
        return X.at[7].set(1.0)  # steer angle 0 -> (cos, sin) = (1, 0)


class CircularObstacleCBC(NamedTuple):
    """Relative-degree-2 circular obstacle CBC for car states whose
    position is X[pos_idx] (car/core.py:92-158).  Lie derivatives via
    jax.grad (the reference uses torch autograd the same way)."""
    center: jax.Array
    radius: float
    k_alpha: Tuple[float, float] = (2.0, 3.0)
    pos_idx: Tuple[int, int] = (0, 1)
    max_unsafe_prob: float = 0.01

    def cbf(self, X):
        pos = jnp.stack([X[self.pos_idx[0]], X[self.pos_idx[1]]])
        return jnp.sum((pos - self.center) ** 2) - self.radius ** 2

    def grad_cbf(self, X):
        return jax.grad(self.cbf)(X)

    def lie_f(self, model, X):
        return self.grad_cbf(X) @ model.f_func(X)

    def grad_lie_f(self, model, X):
        return jax.grad(lambda xx: self.lie_f(model, xx))(X)

    def lie2_f(self, model, X):
        return self.grad_lie_f(model, X) @ model.f_func(X)

    def lie_g_lie_f(self, model, X):
        return self.grad_lie_f(model, X) @ model.g_func(X)

    def A(self, model, X):
        return -self.lie_g_lie_f(model, X)

    def b(self, model, X):
        ka = jnp.asarray(self.k_alpha, X.dtype)
        eta = jnp.stack([self.cbf(X), self.lie_f(model, X)])
        return self.lie2_f(model, X) + ka @ eta
