"""Racecar environment — TPU-native equivalent of the reference's pybullet
RacecarEnv (bayes_cbf/bulletcar/racecar.py:39-137).

The reference wraps the MIT racecar in a pybullet physics sim as a
black-box DynamicsModel: observed state is the 2D pose (x, y, theta),
controls are normalized (target wheel velocity, steering angle) in
[-1, 1], and `step(action, dt)` returns dict(x=pose, xdot=finite diff);
the underlying sim carries hidden velocity/steering state, motor force
limits, and a steering servo.

Here the same capability is a pure-JAX dynamic bicycle with explicit
hidden state (speed + steering-servo angle), first-order motor and servo
responses, and drag — an environment whose true dynamics are NOT
control-affine in the observed pose, exactly the role the bullet car
plays for the learning stack (differentiable and scan-able as a bonus).
A thin stateful wrapper reproduces the reference's host-side interface
(state_size/ctrl_size/step/set_init_state)."""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RacecarState(NamedTuple):
    pose: jax.Array    # (3,) x, y, theta — the observed state
    v: jax.Array       # () longitudinal speed (hidden)
    delta: jax.Array   # () steering angle (hidden servo state)


class RacecarDynamics(NamedTuple):
    """Functional core: dynamic bicycle with motor/servo lag (the pybullet
    car's velocity-controlled wheels + position-controlled steering)."""
    wheelbase: float = 0.325        # MIT racecar scale
    max_speed: float = 4.0          # action[0]=1 -> 4 m/s target
    max_steer: float = 0.5          # rad at action[1]=1
    motor_gain: float = 8.0         # 1/s first-order speed response
    servo_gain: float = 20.0        # 1/s steering servo response
    accel_limit: float = 10.0       # m/s^2 motor force limit
    drag: float = 0.15              # 1/s speed decay

    state_size: int = 3
    ctrl_size: int = 2

    def init_state(self, x0, dtype=jnp.float64) -> RacecarState:
        x0 = jnp.asarray(x0, dtype)
        return RacecarState(pose=x0, v=jnp.zeros((), dtype),
                            delta=jnp.zeros((), dtype))

    def derivs(self, s: RacecarState, action):
        a = jnp.clip(jnp.asarray(action, s.pose.dtype), -1.0, 1.0)
        v_t = a[0] * self.max_speed
        d_t = a[1] * self.max_steer
        th = s.pose[2]
        dv = jnp.clip(self.motor_gain * (v_t - s.v),
                      -self.accel_limit, self.accel_limit) - self.drag * s.v
        dd = self.servo_gain * (d_t - s.delta)
        dpose = jnp.stack([s.v * jnp.cos(th), s.v * jnp.sin(th),
                           s.v * jnp.tan(s.delta) / self.wheelbase])
        return dpose, dv, dd

    def step(self, s: RacecarState, action, dt,
             substeps: int = 4) -> Tuple[RacecarState, jax.Array]:
        """Advance by dt with Euler substeps; returns (state', xdot) where
        xdot is the finite-difference pose rate (the reference's
        step contract, racecar.py:123-131)."""
        h = dt / substeps
        pose0 = s.pose

        def sub(s, _):
            dpose, dv, dd = self.derivs(s, action)
            return RacecarState(pose=s.pose + h * dpose, v=s.v + h * dv,
                                delta=s.delta + h * dd), None

        s, _ = jax.lax.scan(sub, s, None, length=substeps)
        return s, (s.pose - pose0) / dt


class RacecarEnv:
    """Host-side stateful wrapper with the reference RacecarEnv surface
    (state_size/ctrl_size properties, step(action, dt) -> dict(x, xdot),
    set_init_state; obstacles carried as plain geometry)."""

    def __init__(self, dynamics: RacecarDynamics = RacecarDynamics(),
                 obstacle_centers=(), obstacle_radii=(),
                 dtype=jnp.float64):
        self.dynamics = dynamics
        self.obstacle_centers = [jnp.asarray(c, dtype)
                                 for c in obstacle_centers]
        self.obstacle_radii = list(obstacle_radii)
        self._dtype = dtype
        self._state = dynamics.init_state(jnp.zeros(3), dtype)
        self._step = jax.jit(dynamics.step, static_argnames=("substeps",))

    @property
    def state_size(self):
        return self.dynamics.state_size

    @property
    def ctrl_size(self):
        return self.dynamics.ctrl_size

    def set_init_state(self, x0):
        self._state = self.dynamics.init_state(
            jnp.asarray(x0, self._dtype), self._dtype)

    def get2DObs(self):
        return self._state.pose

    def step(self, action, dt):
        self._state, xdot = self._step(self._state,
                                       jnp.asarray(action, self._dtype), dt)
        return dict(x=self._state.pose, xdot=xdot)
