"""L0 functional substrate: term extraction and small scalar helpers.

The reference extracts affine/quadratic structure of constraint functions
with torch autograd passes (bayes_cbf/misc.py:268-285).  Here the same math
is expressed with `jax.grad` / `jax.jacfwd`, which composes cleanly under
jit/vmap and has no graph-retention pitfalls.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def affine_terms(func, u):
    """For f affine in u, return (a, b) with f(u) = a @ u + b.

    Parity: bayes_cbf/misc.py:268-274 (get_affine_terms).
    """
    a = jax.grad(func)(u)
    b = func(u) - a @ u
    return a, b


def quadratic_terms(func, u):
    """For f quadratic in u, return (Q, p, r) with f(u) = u Q u + p u + r.

    Parity: bayes_cbf/misc.py:277-285 (get_quadratic_terms).
    """
    grad_f = jax.grad(func)
    Q = 0.5 * jax.jacfwd(grad_f)(u)
    p = grad_f(u) - 2.0 * Q @ u
    r = func(u) - u @ Q @ u - p @ u
    return Q, p, r


def normalize_radians(theta):
    """Wrap an angle to (-pi, pi].  Parity: bayes_cbf/misc.py."""
    return (theta + math.pi) % (2 * math.pi) - math.pi


def clip_vec(x, lo, hi):
    """Elementwise clamp, parity with bayes_cbf/misc.py clip()."""
    return jnp.maximum(jnp.minimum(x, hi), lo)


def epsilon_interp(i, start=(0, 1.0), end=(1000, 0.01)):
    """Log-linear exploration schedule.

    Parity: bayes_cbf/misc.py:261-265 (epsilon) used by
    EpsilonGreedyController — interpolates log-linearly between
    (step si, value sv) and (step ei, value ev).
    """
    (si, sv), (ei, ev) = start, end
    return jnp.exp((i - si) / (ei - si) * (math.log(ev) - math.log(sv))
                   + math.log(sv))
