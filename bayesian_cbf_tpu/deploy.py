"""Real-time deployment wrapper: the serving story for a controller.

The reference's production mode IS a physical control loop — one
controller evaluation per plant tick, 10-100 ms each on CPU+GUROBI
(controllers.py:586,659 per-step prints).  The TPU-native equivalent is
an AOT-compiled step function with a donated device-resident carry:

  * `CompiledController(sim, x0)` lowers and compiles `sim.step` ONCE
    (jit(...).lower(...).compile() — no retrace risk at serve time) with
    the carry donated, so each tick is a single device dispatch that
    reuses the carry buffers in place;
  * each `tick(x_measured)` optionally injects the measured plant state
    (the model-predicted state is replaced — the controller never
    open-loop-drifts from the real plant), runs plan -> cones -> SOCP ->
    buffer-record -> (scheduled in-graph refit), and returns the host
    control u plus the step's ControlInfo diagnostics;
  * the GP training state lives inside the carry, so online learning
    (ring-buffer writes + scheduled refits) happens on-device with no
    host round trip beyond u itself.

Cite: sampling.py:49-75 (the reference per-tick loop contract),
unicycle_move_to_pose.py:341-344 (refit schedule inside the loop).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _uniquify(tree):
    """Copy any leaf that shares a buffer with an earlier leaf: donation
    rejects the same buffer appearing twice in one call, and freshly
    initialized carries legitimately share zero-filled buffers."""
    seen = set()

    def f(a):
        a = jnp.asarray(a)
        marker = id(a)
        if marker in seen:
            return jnp.array(a, copy=True)
        seen.add(marker)
        return a

    return jax.tree.map(f, tree)


def _with_continuous_updates(sim, flag: bool):
    """Return `sim` with the learned-dynamics continuous_updates flag set
    (handles both the unicycle sim's `learned_dynamics` field and the
    pendulum sim's `learned`)."""
    for field in ("learned_dynamics", "learned"):
        lrn = getattr(sim, field, None)
        if lrn is not None and hasattr(lrn, "continuous_updates"):
            return sim._replace(**{field: lrn._replace(
                continuous_updates=flag)})
    raise ValueError("sim has no learned-dynamics field with a "
                     "continuous_updates flag")


class CompiledController:
    """AOT-compiled per-tick controller for deployment/serving."""

    def __init__(self, sim, x0, key: Optional[jax.Array] = None,
                 continuous_updates: Optional[bool] = None):
        """`continuous_updates=True` turns on per-tick O(K^2) rank-1
        posterior appends in the compiled tick: every observed sample
        enters the GP cache immediately (the reference can only
        incorporate data through a full refit, control_affine_model.py:
        379-395); scheduled hyperparameter refits still run on the
        train_every_n_steps schedule.  None keeps the sim's own flag."""
        if continuous_updates is not None:
            sim = _with_continuous_updates(sim, continuous_updates)
        self.sim = sim
        if key is None:
            key = jax.random.PRNGKey(0)
        carry0 = _uniquify(sim.init_state(jnp.asarray(x0), key))
        t0 = jnp.asarray(0, dtype=jnp.int32)

        def step(carry, t):
            return sim.step(carry, t)

        # donate the carry: the GP buffers / warm-start state are updated
        # in place on device every tick
        self._compiled = (jax.jit(step, donate_argnums=0)
                          .lower(carry0, t0).compile())
        self._carry = carry0
        self._t = 0

    @property
    def t(self) -> int:
        return self._t

    def tick(self, x_measured=None):
        """One control tick.  Returns (u (m,) numpy, info ControlInfo).

        `x_measured`: the plant state observed this tick; when given it
        replaces the model-propagated state so the loop stays closed on
        the real plant.  When None (pure simulation) the internally
        Euler-propagated state is used."""
        if self._carry is None:
            raise RuntimeError(
                "controller state was invalidated by a failed tick "
                "(the donated carry is gone); call restore(checkpoint) "
                "before ticking again")
        carry = self._carry
        if x_measured is not None:
            x = jnp.asarray(x_measured, carry[0].dtype)
            carry = (x,) + tuple(carry[1:])
        # The compiled tick donates the carry: once dispatched, the old
        # buffers are dead whether or not the call succeeds (transient
        # remote-compile/TPU errors included).  Drop our reference first
        # so a failure leaves the controller in an explicit
        # needs-restore state instead of silently holding deleted arrays.
        self._carry = None
        new_carry, (x, u, xdot, info, knl) = self._compiled(
            carry, jnp.asarray(self._t, dtype=jnp.int32))
        self._carry = new_carry
        self._t += 1
        return np.asarray(u), info

    def state(self):
        """A snapshot of the device-resident carry (x, GP/learner
        state[, warm-start]) — a pytree of arrays; checkpoint it with
        observability.save_checkpoint for warm restarts.

        Returns a defensive copy: the live carry is donated to the next
        tick(), which would invalidate the returned buffers mid-use."""
        if self._carry is None:
            raise RuntimeError(
                "controller state unavailable after a failed tick; "
                "call restore(checkpoint) first")
        return jax.tree.map(jnp.copy, self._carry)

    def restore(self, carry) -> None:
        """Install a carry previously taken from `state()` (e.g. loaded
        via observability.load_checkpoint)."""
        self._carry = _uniquify(jax.tree.map(jnp.copy, carry))

    def cost_analysis(self):
        """XLA cost analysis of the compiled tick (flops, bytes)."""
        try:
            return self._compiled.cost_analysis()
        except Exception:
            return None
