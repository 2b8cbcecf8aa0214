"""Tiny jitted QP solve via SOCP epigraph reduction.

The reference's QPController solves  min ||A u + b||^2  s.t.  c_i^T u + d_i >= 0
with GUROBI (bayes_cbf/optimizers.py:105-116).  Minimizing ||Au+b|| is the
same argmin, so we lift to the epigraph SOCP

    min t   s.t.  ||A u + b|| <= t,   c_i^T u + d_i >= 0

with variables x = [u; t]; linear inequalities are 1-dim cones.
"""
from __future__ import annotations

import jax.numpy as jnp

from .socp import solve_socp


def solve_qp_active_set(A, b, lin_cs, lin_ds, iters: int = 30):
    """min ||A u + b||^2 s.t. lin_cs @ u + lin_ds >= 0.

    lin_cs: (nc, m); lin_ds: (nc,).  Returns (u, solution)."""
    m = A.shape[1]
    nc = lin_cs.shape[0]
    dtype = A.dtype
    c = jnp.concatenate([jnp.zeros((m,), dtype), jnp.ones((1,), dtype)])
    # epigraph cone: s0 = t, s1 = A u + b  ->  G row block
    G_epi = jnp.concatenate([
        jnp.concatenate([jnp.zeros((1, m), dtype), -jnp.ones((1, 1), dtype)], 1),
        jnp.concatenate([-A, jnp.zeros((A.shape[0], 1), dtype)], 1)], 0)
    h_epi = jnp.concatenate([jnp.zeros((1,), dtype), b])
    # linear constraints as 1-dim cones: s = c_i^T u + d_i >= 0
    G_lin = jnp.concatenate([-lin_cs, jnp.zeros((nc, 1), dtype)], 1)
    h_lin = lin_ds
    G = jnp.concatenate([G_epi, G_lin], 0)
    h = jnp.concatenate([h_epi, h_lin], 0)
    dims = (1 + A.shape[0],) + (1,) * nc
    sol = solve_socp(c, G, h, dims, iters=iters)
    return sol.x[:m], sol
