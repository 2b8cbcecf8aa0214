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

    def _step_impl(self, carry, t, learn_fn):
        warm = carry[2] if len(carry) == 3 else None
        x, dyn_state = carry[0], carry[1]
        mom = self.learned_dynamics.moments(dyn_state, x)
        out = bayes_clf_control(self.controller, self.clf, self.cbfs,
                                self.planner, lambda _: mom, x, t, warm=warm)
        u, info = out[0], out[1]
        knl = self.learned_dynamics.kernel_channels(dyn_state, mom, u)
        # online learning: record (x, u); refits happen on the reference's
        # schedule (dynamics.train, unicycle_move_to_pose.py:993-994) —
        # either in-graph (observe) or between segment scans (record +
        # fit_segments), see _simulate_unicycle
        dyn_state = learn_fn(dyn_state, x, u)
        x_next, xdot = self.true_dynamics.step(x, u, self.dt)
        if warm is None:
            return (x_next, dyn_state), (x, u, xdot, info, knl)
        return (x_next, dyn_state, out[2]), (x, u, xdot, info, knl)

    def step(self, carry, t):
        """One control step: plan -> cones -> SOCP -> record/learn -> Euler,
        with the scheduled refit behind an in-graph cond (self-contained,
        used by the driver entry; the rollout runners use step_no_fit +
        segmented fits instead — see fit_segments).

        The carry optionally ends with the IPM warm-start state (previous
        step's (x, s, z)) when controller.warm_start is set."""
        return self._step_impl(carry, t, self.learned_dynamics.observe)

    def step_no_fit(self, carry, t):
        """step() without the in-graph refit cond (buffer recording only)."""
        return self._step_impl(carry, t, self.learned_dynamics.record)


def fit_segments(numSteps: int, train_every: int, enable: bool):
    """Static refit schedule: [(start, end_exclusive, fit_after), ...].

    The reference fits when the step index is a positive multiple of
    train_every (unicycle_move_to_pose.py:341-344) — a STATIC schedule.
    Cutting the rollout scan at those boundaries and running the fit
    *between* segment scans executes it exactly on the scheduled steps by
    construction, independent of how the backend lowers conditionals (a
    vmapped cond lowers to select and runs both branches; a scalar cond
    branches, but only if the compiler keeps it).  Measured on-chip this
    matches the scalar-cond design's wall time while making the schedule
    cost explicit: each fit event costs ~training_iter x 24 ms at
    batch=256, k=200 — the dominant term of the flagship loop."""
    if not enable or train_every <= 0:
        return [(0, numSteps, False)]
    segs = []
    start = 0
    for b in range(train_every, numSteps, train_every):
        segs.append((start, b + 1, True))
        start = b + 1
    if start < numSteps:
        segs.append((start, numSteps, False))
    return segs


def _where_tree(keep, a_tree, b_tree):
    """Per-rollout select over batched pytrees (keep: (B,) bool)."""
    def sel(a, b):
        k = keep.reshape(keep.shape + (1,) * (a.ndim - 1))
        return jnp.where(k, a, b)
    return jax.tree.map(sel, a_tree, b_tree)


def scan_with_scheduled_fits(step_fn, fit_fn, carry, numSteps: int,
                             train_every: int, enable: bool,
                             state_index: int = 1, fit_fn_warm=None):
    """Single-episode rollout as ONE scan with the scheduled refit behind
    a scalar `lax.cond` inside the body.

    Semantics are identical to cutting the scan at `fit_segments`
    boundaries (the fit runs after completing step t for every positive
    multiple t of train_every, guarded on a non-empty buffer), but the
    fit program appears ONCE in the compiled module instead of once per
    segment — the flagship pendulum episode has 25 fit events, and the
    segmented program's compile time scales with the segment count
    (round-3 directive 8).  Only valid UNBATCHED: under vmap a cond
    lowers to select and would run the Adam fit loop every step — the
    batched runners (`_simulate_unicycle_batch`,
    `run_pendulum_online_batch`) keep the segmented structure.

    `carry[state_index]` must be the LearnedDynState (exposes count_res).

    When `fit_fn_warm` is given, the FIRST scheduled fit (t == train_every)
    runs `fit_fn` and every later one runs `fit_fn_warm` — the
    warm-started reduced-budget refit knob
    (LearnedShiftInvariantDynamics.training_iter_warm).

    Known edge (documented, not reachable at any real config): the
    first/warm split keys on the EVENT index (t == train_every), not on
    "has a fit actually run".  If the t == train_every event were
    skipped by the count_res > 0 guard, the first real fit would run the
    warm budget.  The reservoir accepts a residual every step from t=1
    on (models/dynamics.py `append_residual`: accept == have_prev while
    below capacity), so count_res >= 1 at every t >= 1 and the skip can
    never fire for train_every >= 1.  If a future sampler can reject
    early residuals, switch this dispatch to a has-fit flag in the carry.
    """
    do_sched = enable and train_every > 0

    def body(carry, t):
        carry, y = step_fn(carry, t)
        if do_sched:
            st = carry[state_index]
            do_fit = ((t > 0) & (t % train_every == 0)
                      & (st.count_res > 0))
            if fit_fn_warm is None:
                run_fit = fit_fn
            else:
                def run_fit(s):
                    return jax.lax.cond(t == train_every, fit_fn,
                                        fit_fn_warm, s)
            st = jax.lax.cond(do_fit, run_fit, lambda s: s, st)
            carry = (carry[:state_index] + (st,)
                     + carry[state_index + 1:])
        return carry, y

    return jax.lax.scan(body, carry, jnp.arange(numSteps))


def scan_with_scheduled_fits_batched(step_fn, fit_fn, carry, numSteps: int,
                                     train_every: int, enable: bool,
                                     state_index: int = 1,
                                     fit_fn_warm=None):
    """Batched (scan-of-vmap) twin of `scan_with_scheduled_fits`: ONE
    scan whose body runs the (already-vmapped) step, then the per-episode
    refit behind a SCALAR `lax.cond`.

    The old segmented structure cut the scan at every fit boundary "so
    the fit can never lower to a per-step select under vmap" — but that
    concern only applies to vmap-OF-scan.  These runners are
    scan-of-vmap: the schedule predicate (t > 0) & (t % train_every == 0)
    depends on the scalar step index alone, so the cond stays a real
    HLO conditional and the Adam loop executes exactly on the scheduled
    steps.  The payoff is compile time: the segmented flagship pendulum
    program carried 25 scan bodies + 25 vmapped fit programs (482 s
    compile, records/tpu_round4.jsonl); this emits 1 scan + at most 2
    fit programs (round-4 verdict 7).

    `fit_fn` / `fit_fn_warm` act on a SINGLE LearnedDynState (vmapped
    here); per-element acceptance is masked on a non-empty reservoir
    exactly like the segmented runner (`_where_tree` on count_res)."""
    do_sched = enable and train_every > 0

    def body(carry, t):
        carry, y = step_fn(carry, t)
        if do_sched:
            st = carry[state_index]
            do_fit = (t > 0) & (t % train_every == 0)

            def run_fit(s):
                if fit_fn_warm is None:
                    fitted = jax.vmap(fit_fn)(s)
                else:
                    fitted = jax.lax.cond(t == train_every,
                                          jax.vmap(fit_fn),
                                          jax.vmap(fit_fn_warm), s)
                return _where_tree(s.count_res > 0, fitted, s)

            st = jax.lax.cond(do_fit, run_fit, lambda s: s, st)
            carry = (carry[:state_index] + (st,)
                     + carry[state_index + 1:])
        return carry, y

    return jax.lax.scan(body, carry, jnp.arange(numSteps))


def _simulate_unicycle(sim: UnicycleSim, x0, key):
    lrn = sim.learned_dynamics
    carry = sim.init_state(x0, key)
    carry_out, (X, U, Xdot, info, knl) = scan_with_scheduled_fits(
        sim.step_no_fit, lrn.fit_now_first, carry, sim.numSteps,
        lrn.train_every_n_steps, lrn.enable_learning,
        fit_fn_warm=(lrn.fit_now_warm if lrn.first_fit_differs else None))
    out = RolloutOutputs(X=X, U=U, Xdot=Xdot, info=info, knl=knl)
    return out, carry_out


def simulate_unicycle_with_state(sim: UnicycleSim, x0, key=None):
    """Episode runner that ALSO returns the final scan carry (whose
    element 1 is the LearnedDynState: fitted params + reservoir +
    posterior cache).  Used by the warm-refit posterior-distance pin
    (round-3 verdict 8) and by anything that wants to checkpoint or
    inspect the learned model at episode end."""
    if key is None:
        key = jax.random.PRNGKey(0)
    fn = _cached_sim_jit(
        sim, "episode_with_state",
        lambda: (lambda x0_, key_: _simulate_unicycle(sim, x0_, key_)))
    return fn(jnp.asarray(x0), key)


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
    """Batched episodes as scan-of-vmap with SEGMENTED refits.

    The batch axis vmaps inside the time scan (scan-of-vmap), and the
    time scan is cut at the static refit boundaries (fit_segments).
    DELIBERATELY segmented, not the single-scan-with-cond structure
    (scan_with_scheduled_fits_batched, which the pendulum runner uses):
    inside a segment the (B, K, K) posterior cache is an UNCHANGED
    carry element, which XLA hoists VMEM-resident across steps; with
    the refit cond in the scan body the cache becomes a conditionally
    written carry and every step re-reads it from HBM — measured
    on-chip: gp_moments 0.083 s -> 0.536 s and the flagship headline
    510k -> 385k steps/s (round-5 A/B).  The segment count here is
    small (5 fits at the flagship config), so the compile cost the
    pendulum's 25-event schedule paid for segmentation does not apply."""
    B = x0s.shape[0]
    lrn = sim.learned_dynamics
    init_states = jax.vmap(
        lambda k: lrn.init_state(k, dtype=x0s.dtype))(keys)
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
            mom = lrn.moments(st, x)
            out = bayes_clf_control(sim.controller, sim.clf, sim.cbfs,
                                    sim.planner, lambda _: mom, x, t,
                                    warm=(w if warm_on else None))
            u, info = out[0], out[1]
            w = out[2] if warm_on else w
            knl = lrn.kernel_channels(st, mom, u)
            st = lrn.record(st, x, u)
            x_next, xdot = sim.true_dynamics.step(x, u, sim.dt)
            return x_next, u, xdot, info, st, w, knl

        X_next, U, Xdot, info, states, warms, knl = jax.vmap(one)(
            X, states, warms)
        return (X_next, states, warms), (X, U, Xdot, info, knl)

    segs = fit_segments(sim.numSteps, lrn.train_every_n_steps,
                        lrn.enable_learning)
    carry = (x0s, init_states, init_warms)
    ys = []
    fit_event = 0
    for (s, e, do_fit) in segs:
        carry, y = jax.lax.scan(step, carry, jnp.arange(s, e))
        ys.append(y)
        if do_fit:
            X, states, warms = carry
            # first fit event spends the full Adam budget; later ones are
            # warm-started (params persist across fits, matching the
            # reference's reused torch module) and may use the reduced
            # training_iter_warm budget.  Keyed on the event index, not
            # "has fit yet" — safe for the same reason as
            # scan_with_scheduled_fits (count_res >= 1 at every event;
            # see its docstring's known-edge note)
            fit = (lrn.fit_now_first if fit_event == 0
                   else lrn.fit_now_warm)
            fitted = jax.vmap(fit)(states)
            states = _where_tree(states.count_res > 0, fitted, states)
            carry = (X, states, warms)
            fit_event += 1
    X, U, Xdot, info, knl = jax.tree.map(
        lambda *a: jnp.concatenate(a, 0), *ys)
    # -> outputs with leading batch dim (B, T, ...)
    swap = lambda a: jnp.swapaxes(a, 0, 1)
    return RolloutOutputs(X=swap(X), U=swap(U), Xdot=swap(Xdot),
                          info=jax.tree.map(swap, info),
                          knl=jax.tree.map(swap, knl))


# UnicycleSim mixes array leaves with static config ints, so it is closed
# over rather than passed as a traced argument; the jitted episode runner is
# cached per sim object (same sim -> same executable).  Bounded LRU so a
# long parameter sweep in one process cannot pin every compiled executable
# (same rationale as experiments.pendulum._RUN_CACHE).
from collections import OrderedDict

_SIM_CACHE: "OrderedDict" = OrderedDict()
_SIM_CACHE_MAX = 8


def _cached_sim_jit(sim, tag, make_fn):
    """Per-(sim, tag) jitted-runner cache: same sim object -> same
    compiled executable, never a fresh jit closure per call."""
    k = (id(sim), tag)
    entry = _SIM_CACHE.get(k)
    if entry is None or entry[0] is not sim:
        fn = jax.jit(make_fn())
        _SIM_CACHE[k] = (sim, fn)
        while len(_SIM_CACHE) > _SIM_CACHE_MAX:
            _SIM_CACHE.popitem(last=False)
    else:
        _SIM_CACHE.move_to_end(k)
        fn = entry[1]
    return _SIM_CACHE[k][1]


def simulate_unicycle(sim: UnicycleSim, x0, key=None) -> RolloutOutputs:
    """Run the full episode as one jitted lax.scan."""
    if key is None:
        key = jax.random.PRNGKey(0)
    fn = _cached_sim_jit(
        sim, "episode",
        lambda: (lambda x0_, key_: _simulate_unicycle(sim, x0_, key_)[0]))
    return fn(jnp.asarray(x0), key)
