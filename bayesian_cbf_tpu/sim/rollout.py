"""L8 — on-device rollout loops.

The reference's rollout (`sample_generator_trajectory`, sampling.py:49-75)
is a Python for-loop: controller -> visualizer -> Euler step, with GUROBI
and gpytorch round-trips inside.  Here the entire
sense -> learn -> cone -> SOCP -> step cycle is one `jax.lax.scan` body,
jit-compiled once, so a 2000-step episode is a single device program and
thousands of episodes vmap/shard over a mesh (SURVEY.md 5.7/5.8).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..control.bayes_controller import (BayesCLFControllerConfig,
                                        ControlInfo, bayes_clf_control,
                                        warm_init)
from ..models.dynamics import (KernelChannels, LearnedDynState,
                               LearnedShiftInvariantDynamics)


class RolloutOutputs(NamedTuple):
    X: jax.Array           # (T, n) states before each step
    U: jax.Array           # (T, m) applied controls
    Xdot: jax.Array        # (T, n)
    info: ControlInfo      # stacked per-step controller diagnostics
    # per-step kernel hyperparameters + posterior variances (the reference's
    # vis/knl_* channels, unicycle_move_to_pose.py:970-992); feeds the
    # self-triggered-interval analysis. None for generic rollouts.
    knl: Optional[KernelChannels] = None


class UnicycleSim(NamedTuple):
    """Static description of a unicycle tracking experiment
    (track_trajectory_ackerman_clf_bayesian,
    unicycle_move_to_pose.py:1689-1734)."""
    true_dynamics: NamedTuple
    learned_dynamics: LearnedShiftInvariantDynamics
    controller: BayesCLFControllerConfig
    clf: NamedTuple
    cbfs: tuple
    planner: NamedTuple
    dt: float
    numSteps: int

    def init_state(self, x0, key):
        dtype = jnp.asarray(x0).dtype
        dyn_state = self.learned_dynamics.init_state(key, dtype=dtype)
        if self.controller.warm_start:
            return (jnp.asarray(x0), dyn_state,
                    self._warm0(jnp.asarray(x0), dyn_state))
        return jnp.asarray(x0), dyn_state

    def _warm0(self, x0, dyn_state):
        """Seed the IPM warm-start state by solving step 0 once at the full
        (cold) iteration count; the in-scan solves then always start from a
        near-optimal previous solution and can run cfg.socp_iters_warm."""
        cfg_full = self.controller._replace(
            socp_iters_warm=self.controller.socp_iters)
        moments_fn = lambda xx: self.learned_dynamics.moments(dyn_state, xx)
        w0 = warm_init(self.controller, len(self.cbfs), x0.dtype)
        _, _, w0 = bayes_clf_control(cfg_full, self.clf, self.cbfs,
                                     self.planner, moments_fn, x0,
                                     jnp.asarray(0), warm=w0)
        return w0

    def step(self, carry, t):
        """One control step: plan -> cones -> SOCP -> record/learn -> Euler.

        The carry optionally ends with the IPM warm-start state (previous
        step's (x, s, z)) when controller.warm_start is set."""
        warm = carry[2] if len(carry) == 3 else None
        x, dyn_state = carry[0], carry[1]
        mom = self.learned_dynamics.moments(dyn_state, x)
        out = bayes_clf_control(self.controller, self.clf, self.cbfs,
                                self.planner, lambda _: mom, x, t, warm=warm)
        u, info = out[0], out[1]
        knl = self.learned_dynamics.kernel_channels(dyn_state, mom, u)
        # online learning: record (x, u) and refit on schedule
        # (reference calls dynamics.train(x, uopt) inside control(),
        #  unicycle_move_to_pose.py:993-994)
        dyn_state = self.learned_dynamics.observe(dyn_state, x, u)
        x_next, xdot = self.true_dynamics.step(x, u, self.dt)
        if warm is None:
            return (x_next, dyn_state), (x, u, xdot, info, knl)
        return (x_next, dyn_state, out[2]), (x, u, xdot, info, knl)


def _simulate_unicycle(sim: UnicycleSim, x0, key) -> RolloutOutputs:
    carry = sim.init_state(x0, key)
    carry, (X, U, Xdot, info, knl) = jax.lax.scan(
        sim.step, carry, jnp.arange(sim.numSteps))
    return RolloutOutputs(X=X, U=U, Xdot=Xdot, info=info, knl=knl)


def sample_generator_trajectory(dynamics, controller_fn, x0, numSteps, dt):
    """Generic rollout: u = controller(x, t); x' = dynamics.step(x, u, dt)
    -> (Xdot, X, U), the reference's sampling.py:49-75 contract, as one
    jitted scan.  controller_fn must be pure (close over any state)."""
    def step(x, t):
        u = controller_fn(x, t)
        x_next, xdot = dynamics.step(x, u, dt)
        return x_next, (xdot, x, u)

    _, (Xdot, X, U) = jax.lax.scan(step, jnp.asarray(x0),
                                   jnp.arange(numSteps))
    return Xdot, X, U


def sample_generator_independent(dynamics, key, n, x_lo, x_hi, u_lo, u_hi):
    """i.i.d. (x, u) -> xdot samples (sampling.py:78-90)."""
    kx, ku = jax.random.split(key)
    X = jax.random.uniform(kx, (n, len(x_lo)),
                           minval=jnp.asarray(x_lo), maxval=jnp.asarray(x_hi))
    U = jax.random.uniform(ku, (n, len(u_lo)),
                           minval=jnp.asarray(u_lo), maxval=jnp.asarray(u_hi))
    Xdot = jax.vmap(lambda x, u: dynamics.f_func(x) + dynamics.g_func(x) @ u)(
        X, U)
    return Xdot, X, U


def _simulate_unicycle_batch(sim: UnicycleSim, x0s, keys) -> RolloutOutputs:
    """Batched episodes as ONE scan-of-vmap (not vmap-of-scan).

    Crucial for throughput: the per-step GP-refit `lax.cond` has a
    batch-uniform predicate (the schedule depends only on t), but a vmapped
    cond lowers to `select` and would execute the Adam fit loop at every
    step for every rollout.  Scanning time outside and vmapping the batch
    inside keeps the fit behind a *scalar* cond: it runs only on the
    scheduled steps."""
    B = x0s.shape[0]
    init_states = jax.vmap(
        lambda k: sim.learned_dynamics.init_state(k, dtype=x0s.dtype))(keys)
    warm_on = sim.controller.warm_start
    if warm_on:
        init_warms = jax.vmap(sim._warm0)(x0s, init_states)
    else:
        w0 = warm_init(sim.controller, len(sim.cbfs), x0s.dtype)
        init_warms = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), w0)

    def step(carry, t):
        X, states, warms = carry

        def one(x, st, w):
            mom = sim.learned_dynamics.moments(st, x)
            out = bayes_clf_control(sim.controller, sim.clf, sim.cbfs,
                                    sim.planner, lambda _: mom, x, t,
                                    warm=(w if warm_on else None))
            u, info = out[0], out[1]
            w = out[2] if warm_on else w
            knl = sim.learned_dynamics.kernel_channels(st, mom, u)
            st = sim.learned_dynamics.record(st, x, u)
            x_next, xdot = sim.true_dynamics.step(x, u, sim.dt)
            return x_next, u, xdot, info, st, w, knl

        X_next, U, Xdot, info, states, warms, knl = jax.vmap(one)(
            X, states, warms)
        states = jax.lax.cond(
            sim.learned_dynamics.should_fit_at(t),
            jax.vmap(sim.learned_dynamics.fit_now),
            lambda s: s, states)
        return (X_next, states, warms), (X, U, Xdot, info, knl)

    carry = (x0s, init_states, init_warms)
    _, (X, U, Xdot, info, knl) = jax.lax.scan(step, carry,
                                              jnp.arange(sim.numSteps))
    # -> outputs with leading batch dim (B, T, ...)
    swap = lambda a: jnp.swapaxes(a, 0, 1)
    return RolloutOutputs(X=swap(X), U=swap(U), Xdot=swap(Xdot),
                          info=jax.tree.map(swap, info),
                          knl=jax.tree.map(swap, knl))


# UnicycleSim mixes array leaves with static config ints, so it is closed
# over rather than passed as a traced argument; the jitted episode runner is
# cached per sim object (same sim -> same executable).
_SIM_CACHE: dict = {}


def simulate_unicycle(sim: UnicycleSim, x0, key=None) -> RolloutOutputs:
    """Run the full episode as one jitted lax.scan."""
    if key is None:
        key = jax.random.PRNGKey(0)
    entry = _SIM_CACHE.get(id(sim))
    if entry is None or entry[0] is not sim:
        fn = jax.jit(lambda x0_, key_: _simulate_unicycle(sim, x0_, key_))
        _SIM_CACHE[id(sim)] = (sim, fn)
    else:
        fn = entry[1]
    return _SIM_CACHE[id(sim)][1](jnp.asarray(x0), key)
