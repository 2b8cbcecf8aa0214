"""Unicycle CLF / CBF function objects and coordinate transforms.

Parity targets: cartesian2polar / polar2cartesian
(bayes_cbf/unicycle_move_to_pose.py:93-139), CLFPolar / CLFCartesian
(:442-615), ObstacleCBF (:618-696), obstacle placement helpers (:1562-1577).

TPU-first delta: the reference hand-derives every gradient and doctest-checks
it against numerical jacobians; here gradients are `jax.grad` of the scalar
definitions — exact by construction — and the tests instead check them
against the reference's hand-derived closed forms.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.func import normalize_radians


def angdiff(a, b):
    return normalize_radians(a - b)


def cartesian2polar(state, state_goal):
    """(x, y, theta), goal -> (rho, alpha, beta).

    rho: distance to goal; alpha: heading relative to the bearing-to-goal;
    beta: goal heading relative to the bearing-to-goal."""
    x, y, theta = state[0], state[1], state[2]
    xg, yg, thetag = state_goal[0], state_goal[1], state_goal[2]
    dx, dy = xg - x, yg - y
    rho = jnp.sqrt(dx * dx + dy * dy)
    phi = jnp.arctan2(dy, dx)
    alpha = angdiff(theta, phi)
    beta = angdiff(thetag, phi)
    return jnp.stack([rho, alpha, beta])


def polar2cartesian(polar, state_goal):
    rho, alpha, beta = polar[0], polar[1], polar[2]
    xg, yg, thetag = state_goal[0], state_goal[1], state_goal[2]
    phi = angdiff(thetag, beta)
    theta = normalize_radians(phi + alpha)
    return jnp.stack([xg - rho * jnp.cos(phi),
                      yg - rho * jnp.sin(phi),
                      theta])


class CLFCartesian(NamedTuple):
    """V(x; x_g) = 1/2 Kp0 rho^2 + Kp1 (1 - cos alpha) + Kp2 (1 - cos beta)
    (unicycle_move_to_pose.py:525-538)."""
    Kp: tuple = (0.9, 1.5, 0.0)

    def clf_terms(self, state, state_goal):
        rho, alpha, beta = cartesian2polar(state, state_goal)
        Kp = jnp.asarray(self.Kp, dtype=state.dtype)
        return jnp.stack([0.5 * Kp[0] * rho ** 2,
                          Kp[1] * (1.0 - jnp.cos(alpha)),
                          Kp[2] * (1.0 - jnp.cos(beta))])

    def clf(self, state, state_goal):
        return jnp.sum(self.clf_terms(state, state_goal))

    def grad_clf(self, state, state_goal):
        return jax.grad(self.clf, argnums=0)(state, state_goal)

    def grad_clf_wrt_goal(self, state, state_goal):
        return jax.grad(self.clf, argnums=1)(state, state_goal)

    def isconverged(self, state, state_goal, tol=1e-3):
        rho = jnp.linalg.norm(state_goal[:2] - state[:2])
        return rho < tol


class CLFPolar(NamedTuple):
    """V(polar) = 1/2 Kp0 rho^2 + Kp1 (1-cos alpha) + Kp2 (1-cos beta)
    + Kp3 (1-cos(beta-alpha)) (unicycle_move_to_pose.py:442-497)."""
    Kp: tuple = (0.6, 1.5, 4.0, 0.0)

    def clf_terms(self, polar, state_goal):
        rho, alpha, beta = polar[0], polar[1], polar[2]
        Kp = jnp.asarray(self.Kp, dtype=polar.dtype)
        return jnp.stack([0.5 * Kp[0] * rho ** 2,
                          Kp[1] * (1.0 - jnp.cos(alpha)),
                          Kp[2] * (1.0 - jnp.cos(beta)),
                          Kp[3] * (1.0 - jnp.cos(beta - alpha))])

    def clf(self, polar, state_goal):
        return jnp.sum(self.clf_terms(polar, state_goal))

    def grad_clf(self, polar, state_goal):
        return jax.grad(self.clf, argnums=0)(polar, state_goal)

    def grad_clf_wrt_goal(self, polar, state_goal):
        return jnp.zeros_like(state_goal)

    def isconverged(self, state, state_goal, tol=1e-3):
        rho = jnp.linalg.norm(state_goal[:2] - state[:2])
        return rho < tol


class ObstacleCBF(NamedTuple):
    """Circular-obstacle barrier: weighted radial + heading terms
    (unicycle_move_to_pose.py:618-696).

    h(x) = w0 * (|p - c|^2 - r^2) + w1 * cos(angle between heading and the
    away-from-obstacle direction)."""
    center: jax.Array
    radius: jax.Array
    term_weights: tuple = (0.5, 0.5)

    def _radial(self, state):
        d = state[:2] - self.center
        return jnp.sum(d * d) - self.radius ** 2

    def _heading(self, state):
        d = state[:2] - self.center
        dn = d / jnp.linalg.norm(d)
        return jnp.cos(state[2]) * dn[0] + jnp.sin(state[2]) * dn[1]

    def cbf(self, state):
        w = self.term_weights
        return w[0] * self._radial(state) + w[1] * self._heading(state)

    def grad_cbf(self, state):
        return jax.grad(self.cbf)(state)


def _R90(dtype=jnp.float64):
    return jnp.array([[0.0, -1.0], [1.0, 0.0]], dtype=dtype)


def obstacles_at_mid_from_start_and_goal(x, x_g, term_weights=(0.5, 0.5)):
    """Two obstacles flanking the midpoint of the start->goal segment
    (unicycle_move_to_pose.py:1562-1571)."""
    x = jnp.asarray(x); x_g = jnp.asarray(x_g)
    mid = (x[:2] + x_g[:2]) / 2.0
    off = _R90(x.dtype) @ (x[:2] - x_g[:2]) / 3.0
    r = jnp.linalg.norm(x[:2] - x_g[:2]) / 4.0
    return [ObstacleCBF(mid + off, r, term_weights),
            ObstacleCBF(mid - off, r, term_weights)]


def single_obstacle_at_mid_from_start_and_goal(x, x_g,
                                               term_weights=(0.5, 0.5)):
    """(unicycle_move_to_pose.py:1573-1577)"""
    x = jnp.asarray(x); x_g = jnp.asarray(x_g)
    mid = (x[:2] + x_g[:2]) / 2.0 + _R90(x.dtype) @ (x[:2] - x_g[:2]) / 10.0
    r = jnp.linalg.norm(x[:2] - x_g[:2]) / 8.0
    return [ObstacleCBF(mid, r, term_weights)]
