"""Pendulum CLF/CBF function objects with analytic Lie-derivative oracles.

Parity: EnergyCLF (bayes_cbf/pendulum.py:530-579), RadialCBF (:582-650),
RadialCBFRelDegree2 (:652-746).  The `lie_*` closed forms double as ground
truth for the GP-algebra tests, exactly as in the reference's strategy
(SURVEY.md section 4.1).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.dynamics import PendulumDynamics


class EnergyCLF(NamedTuple):
    """V = l omega^2/2 + g (1 - cos theta); affine constraint
    A(x) u <= b(x) with A = grad_V g, b = -grad_V f - c V."""
    model: PendulumDynamics = PendulumDynamics()
    clf_c: float = 1.0

    def V_clf(self, x):
        th, w = x[0], x[1]
        g, l = self.model.gravity, self.model.length
        return l * w ** 2 / 2.0 + g * (1.0 - jnp.cos(th))

    def grad_V_clf(self, x):
        return jax.grad(self.V_clf)(x)

    def A(self, x):
        return self.grad_V_clf(x) @ self.model.g_func(x)

    def b(self, x):
        return (-self.grad_V_clf(x) @ self.model.f_func(x)
                - self.clf_c * self.V_clf(x))


class RadialCBF(NamedTuple):
    """Relative-degree-1 collision barrier
    h = (cos delta - cos(theta - theta_c)) (omega^2 + 1)."""
    model: PendulumDynamics = PendulumDynamics()
    cbf_col_gamma: float = 1.0
    cbf_col_delta: float = math.pi / 8
    cbf_col_theta: float = math.pi / 4

    def h_col(self, x):
        th, w = x[0], x[1]
        return ((math.cos(self.cbf_col_delta)
                 - jnp.cos(th - self.cbf_col_theta)) * (w ** 2 + 1.0))

    def grad_h_col(self, x):
        return jax.grad(self.h_col)(x)

    def A(self, x):
        return -self.grad_h_col(x) @ self.model.g_func(x)

    def b(self, x):
        return (self.grad_h_col(x) @ self.model.f_func(x)
                + self.cbf_col_gamma * self.h_col(x))


class RadialCBFRelDegree2(NamedTuple):
    """Relative-degree-2 collision barrier h = cos delta - cos(theta-theta_c)
    with analytic Lie derivatives (pendulum.py:652-746) — the CBC2 oracle."""
    model: PendulumDynamics = PendulumDynamics()
    k_alpha: Tuple[float, float] = (1.0, 3.0)
    cbf_col_delta: float = math.pi / 8
    cbf_col_theta: float = math.pi / 4
    max_unsafe_prob: float = 0.01

    def cbf(self, x):
        th = x[0]
        return math.cos(self.cbf_col_delta) - jnp.cos(th - self.cbf_col_theta)

    def grad_cbf(self, x):
        th = x[0]
        return jnp.stack([jnp.sin(th - self.cbf_col_theta),
                          jnp.zeros((), x.dtype)])

    # -- analytic Lie derivatives (oracles) ------------------------------
    def lie_f_cbf(self, x):
        th, w = x[0], x[1]
        return w * jnp.sin(th - self.cbf_col_theta)

    def grad_lie_f_cbf(self, x):
        th, w = x[0], x[1]
        return jnp.stack([w * jnp.cos(th - self.cbf_col_theta),
                          jnp.sin(th - self.cbf_col_theta)])

    def lie2_f_h_col(self, x):
        th, w = x[0], x[1]
        g, l = self.model.gravity, self.model.length
        return (w ** 2 * jnp.cos(th - self.cbf_col_theta)
                - (g / l) * jnp.sin(th - self.cbf_col_theta) * jnp.sin(th))

    def lie_g_lie_f_h_col(self, x):
        th = x[0]
        m, l = self.model.mass, self.model.length
        return (1.0 / (m * l)) * jnp.sin(th - self.cbf_col_theta)

    # -- ground-truth affine CBC2: A(x) u <= b(x) -------------------------
    def A(self, x):
        return -jnp.reshape(self.lie_g_lie_f_h_col(x), (1,))

    def b(self, x):
        ka = jnp.asarray(self.k_alpha, x.dtype)
        eta = jnp.stack([self.cbf(x), self.lie_f_cbf(x)])
        return self.lie2_f_h_col(x) + ka @ eta
