"""L11 — self-triggered control interval computation.

Parity: bayes_cbf/trigger_interval.py:86-177
(unicycle_trigger_interval_compute).  Given per-step kernel
hyperparameters (sf, ls, A, B), the applied control, and the local state
velocity, bound the Lipschitz constant of the GP sample paths (Eq. 11 of
the paper) on a grid around the trajectory and convert it to the interval

    tau = (1/Lfh) log(1 + Lfh * zeta / ((Lfh + L_alpha) Lh |xdot|))

for which the held control remains provably safe.

TPU-first delta: the reference triple-loops (E x E x Nte) in Python with
numpy; here the derivative-kernel evaluations are batched jnp expressions
vmapped over the trajectory, so a whole run's intervals compute in one
jitted call.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _rbf(X, Xp, sf, ls):
    d = (X[:, None, :] - Xp[None, :, :]) / ls
    return sf ** 2 * jnp.exp(-0.5 * jnp.sum(d * d, -1))


def _d2k_dxi_dxpi(X, Xp, i, sf, ls):
    """d^2 k / dx_i dx'_i on pairs (diagonal pairs X==Xp allowed)."""
    k = _rbf(X, Xp, sf, ls)
    di = (X[:, None, i] - Xp[None, :, i]) / ls[i] ** 2
    return (1.0 / ls[i] ** 2 - di * di) * k


def _d3k(X, Xp, i, sf, ls):
    """d^3 k / dx_i^2 dx'_i (the reference's rbf_d3_knl_d_x_xp_i)."""
    k = _rbf(X, Xp, sf, ls)
    di = (X[:, None, i] - Xp[None, :, i]) / ls[i] ** 2
    dk = -di * k
    return -2.0 * dk / ls[i] ** 2  # matches the reference's (buggy-ish)
    # expression: -2 ls^-2 * d_knl; the +cubic term is dead code there
    # (bayes_cbf/trigger_interval.py:40-43 returns before adding it).


def lipschitz_bound_f(x, sf, ls, A_diag, uBu, key,
                      grid_half_width=(0.1, 0.1, math.pi / 100),
                      grid_pts=10, deltaL=1e-4):
    """High-probability Lipschitz bound of the GP dynamics around x
    (Eq. 11; trigger_interval.py:137-155) plus the numerical sample
    estimate (:66-81).  Returns (Lfh, Lfh_num).

    Parity note on `r`: the reference's `pdist` (trigger_interval.py:
    47-48) is np.linalg.norm of the FULL (N, N, E) pairwise-difference
    tensor — the Frobenius norm over all pairs, ~N x the mean pair
    distance (~103 for its 729-point grid), NOT the grid diameter
    (~0.29).  sqrt(r * A_ii * Lkd_j) feeds Eq. 11, so this choice moves
    Lfh by ~20x at low-amplitude steps; we reproduce it exactly
    (round-3 same-inputs study: with the diameter definition our Lfh
    median on the reference's own logged channels was 0.38 vs its 8.55;
    maxima agreed because maxk dominates there)."""
    E = x.shape[-1]
    axes = [jnp.linspace(-w, w, grid_pts, dtype=x.dtype)
            for w in grid_half_width]
    grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), -1).reshape(-1, E)
    Xtest = grid + x[None, :]
    r = jnp.sqrt(jnp.sum((Xtest[:, None] - Xtest[None, :]) ** 2))

    def per_dir(ej):
        d2 = _d2k_dxi_dxpi(Xtest, Xtest, ej, sf, ls)
        maxk_per_ei = A_diag * uBu * jnp.max(d2)          # (E,)
        d3 = _d3k(Xtest, Xtest, ej, sf, ls)
        Lkd_j = jnp.max(uBu * d3)
        term = 12.0 * math.sqrt(6.0 * E) * jnp.maximum(
            maxk_per_ei, jnp.sqrt(jnp.maximum(r * A_diag * Lkd_j, 0.0)))
        Lfs_col = (math.sqrt(2.0 * math.log(2.0 * E * E / deltaL))
                   * maxk_per_ei + term)                  # (E,)
        return Lfs_col, jnp.max(d2)

    cols, d2max = jax.vmap(per_dir)(jnp.arange(E))
    Lfs = cols.T                                          # (E, E)
    Lfh = jnp.linalg.norm(Lfs) / E

    # numerical sample estimate
    N = Xtest.shape[0]
    w = jax.random.normal(key, (E, N), dtype=x.dtype)
    diag_d2 = jax.vmap(
        lambda ej: jnp.diagonal(_d2k_dxi_dxpi(Xtest, Xtest, ej, sf, ls)))(
            jnp.arange(E))                                # (E, N)
    grad_sigma = A_diag[:, None, None] * uBu * diag_d2[None]  # (E, E, N)
    samples = jnp.abs(w[None] * grad_sigma)
    Lfh_num = jnp.linalg.norm(jnp.max(samples, axis=-1)) / E
    return Lfh, Lfh_num


def per_step_cbf_grad_max(X_traj, cbfs,
                          grid_half_width=(0.1, 0.1, math.pi / 100),
                          grid_pts=6):
    """The reference's per-step Lh: the (SIGNED) max entry of grad_cbf
    over the LOCAL test grid around x_t, maximized over barriers
    (trigger_interval.py:161 `max(torch.max(h.grad_cbf(Xtest)))`)."""
    E = X_traj.shape[-1]
    axes = [jnp.linspace(-w, w, grid_pts, dtype=X_traj.dtype)
            for w in grid_half_width]
    grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), -1).reshape(-1, E)

    def one(x):
        Xtest = grid + x[None, :]
        return jnp.max(jnp.stack([
            jnp.max(jax.vmap(cbf.grad_cbf)(Xtest)) for cbf in cbfs]))

    return jax.vmap(one)(X_traj)


def trigger_intervals(X_traj, Xdot_traj, U_traj, sf_traj, ls_traj,
                      A_traj, B_traj, cbf_grads_max, key,
                      zeta=1e-2, L_alpha=1.0, deltaL=1e-4,
                      grid_pts=6):
    """Per-step self-triggered intervals tau for a whole trajectory
    (trigger_interval.py:120-170), fully vmapped.

    `cbf_grads_max` (Lh): a scalar, or a (T,) per-step array — the
    reference recomputes it per step over the local grid
    (`per_step_cbf_grad_max`)."""
    T = X_traj.shape[0]
    keys = jax.random.split(key, T)
    ones = jnp.ones((U_traj.shape[0], 1), U_traj.dtype)
    UH = jnp.concatenate([ones, U_traj], 1)
    Lh_traj = jnp.broadcast_to(jnp.atleast_1d(
        jnp.asarray(cbf_grads_max, X_traj.dtype)), (T,))

    def per_step(x, xdot, uh, sf, ls, A, B, Lh, k):
        uBu = uh @ B @ uh
        Lfh, Lfh_num = lipschitz_bound_f(
            x, sf, ls, jnp.diagonal(A), uBu, k,
            grid_pts=grid_pts, deltaL=deltaL)
        xvel = jnp.linalg.norm(xdot)

        def tau_of(L):
            return (1.0 / L) * jnp.log1p(
                L * zeta / ((L + L_alpha) * Lh * xvel))

        return tau_of(Lfh), tau_of(Lfh_num), Lfh, Lfh_num, xvel

    return jax.vmap(per_step)(X_traj, Xdot_traj, UH, sf_traj, ls_traj,
                              A_traj, B_traj, Lh_traj, keys)
