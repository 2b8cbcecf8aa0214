"""BASELINE.json config 5 — batched Monte-Carlo rollouts + trigger sweep.

New capability relative to the reference (which is strictly single-rollout,
SURVEY.md 2.11): N independent unicycle Bayes-CBF episodes run as one
sharded program over the device mesh, with on-device aggregate safety
statistics, followed by the self-triggered-interval sweep of
trigger_interval.py computed for a sampled rollout.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..parallel.mesh import batched_rollouts, make_mesh, rollout_safety_stats
from ..observability.trigger import trigger_intervals
from .unicycle import STATE_GOAL, STATE_START, make_ackermann_tracking_sim


def monte_carlo_unicycle(n_rollouts: int = 1024,
                         start_noise: float = 0.05,
                         seed: int = 0,
                         mesh=None,
                         **sim_kw):
    """N perturbed-start Bayes-CBF episodes sharded over the mesh.

    Returns (outs, stats) where outs has leading batch dim and stats are
    scalar on-device reductions (collision fraction, goal distance,
    min clearance)."""
    sim_kw.setdefault("numSteps", 500)
    sim_kw.setdefault("dt", 0.004)
    sim_kw.setdefault("max_train", 64)
    sim_kw.setdefault("training_iter", 30)
    sim = make_ackermann_tracking_sim(**sim_kw)

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    x0 = jnp.asarray(STATE_START)
    x0s = x0[None, :] + start_noise * jax.random.normal(
        k1, (n_rollouts, 3), x0.dtype)
    keys = jax.random.split(k2, n_rollouts)

    if mesh is None:
        mesh = make_mesh()
    outs = batched_rollouts(sim, x0s, keys, mesh)
    centers = jnp.stack([c.center for c in sim.cbfs])
    radii = jnp.stack([jnp.asarray(c.radius) for c in sim.cbfs])
    stats = rollout_safety_stats(outs, centers, radii,
                                 jnp.asarray(STATE_GOAL))
    return sim, outs, stats


def trigger_sweep_for_rollout(sim, outs, rollout_idx: int = 0,
                              stride: int = 10, seed: int = 0,
                              lengthscale=None, outputscale=None,
                              A=None, B=None):
    """Self-triggered interval tau along one episode of a batch
    (trigger_interval.py:86-177 — there driven from tensorboard replays;
    here directly from rollout arrays).

    Kernel hyperparameters come, in order of preference, from (a) the
    explicit arguments, (b) the rollout's per-step `knl` channels (the
    fitted values the reference logs at unicycle_move_to_pose.py:970-992),
    or (c) identity/unit priors — (c) emits a loud warning because the
    resulting tau is NOT the paper's learning-run analysis."""
    import warnings

    sel = lambda a: a[rollout_idx][::stride]
    X = outs.X[rollout_idx][::stride]
    U = outs.U[rollout_idx][::stride]
    Xdot = outs.Xdot[rollout_idx][::stride]
    T = X.shape[0]
    n = X.shape[-1]
    mh = U.shape[-1] + 1
    dt = X.dtype
    knl = getattr(outs, "knl", None)
    if knl is not None and lengthscale is None:
        lengthscale = sel(knl.lengthscale)
        # trigger._rbf uses sf^2 * exp(.); MVGP outputscale IS the variance
        outputscale = jnp.sqrt(sel(knl.outputscale))
        A = sel(knl.A)
        B = sel(knl.B)
    if lengthscale is None:
        warnings.warn(
            "trigger_sweep_for_rollout: no kernel channels on the rollout "
            "and none passed — falling back to identity-prior "
            "hyperparameters; tau will not reflect a learned model.")
    ls = jnp.ones((T, n), dt) if lengthscale is None else lengthscale
    sf = jnp.ones((T,), dt) if outputscale is None else outputscale
    A_ = (jnp.tile(jnp.eye(n, dtype=dt)[None], (T, 1, 1))
          if A is None else A)
    B_ = (jnp.tile(jnp.eye(mh, dtype=dt)[None], (T, 1, 1))
          if B is None else B)
    # per-step Lh over the local grid, the reference's definition
    # (trigger_interval.py:161; signed max, not abs)
    from ..observability.trigger import per_step_cbf_grad_max
    gmax = per_step_cbf_grad_max(X, sim.cbfs)
    return trigger_intervals(X, Xdot, U, sf, ls, A_, B_, gmax,
                             jax.random.PRNGKey(seed))


def trigger_analysis_learning_run(stride: int = 10, seed: int = 0,
                                  **exp_kw):
    """The paper's self-triggered-control analysis over the REAL flagship
    learning run: run unicycle_learning_helps_avoid_getting_stuck, feed the
    per-step fitted kernel hyperparameters (logged by the rollout as `knl`
    channels) into the Eq.-11 Lipschitz/tau math, and return the tau and
    Lfh distributions (reference: trigger_interval.py:86-177 consuming the
    vis/knl_* tensorboard channels; BASELINE.md tau in [2.05e-4, 1.2e-3]).

    Returns (sim, outs, dict with tau/Lfh arrays and summary stats)."""
    from .unicycle import unicycle_learning_helps_avoid_getting_stuck

    sim, outs = unicycle_learning_helps_avoid_getting_stuck(**exp_kw)

    class _Batch1:
        """View a single rollout as a batch of one for the sweep."""
        def __init__(self, o):
            self.X = o.X[None]
            self.U = o.U[None]
            self.Xdot = o.Xdot[None]
            self.knl = jax.tree.map(lambda a: a[None], o.knl)

    tau, tau_num, Lfh, Lfh_num, xvel = trigger_sweep_for_rollout(
        sim, _Batch1(outs), rollout_idx=0, stride=stride, seed=seed)
    import numpy as np
    t = np.asarray(tau)
    L = np.asarray(Lfh)
    # steps where the vehicle is essentially stationary give tau -> inf;
    # the reference only logs steps with |xdot| > 0 (200 logged steps)
    moving = np.asarray(xvel) > 1e-8
    stats = {
        "tau": t, "tau_num": np.asarray(tau_num),
        "Lfh": L, "Lfh_num": np.asarray(Lfh_num),
        "moving": moving,
        "tau_min": float(np.min(t[moving])),
        "tau_median": float(np.median(t[moving])),
        "tau_max": float(np.max(t[moving])),
        "Lfh_min": float(np.min(L[moving])),
        "Lfh_median": float(np.median(L[moving])),
        "Lfh_max": float(np.max(L[moving])),
    }
    return sim, outs, stats
