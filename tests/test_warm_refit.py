"""training_iter_warm: warm-started reduced-budget refits.

The reference fits the SAME torch module on every scheduled refit
(bayes_cbf/unicycle_move_to_pose.py:312-316 construct learned_dynamics
once; fit() at :349 reuses it), so kernel hyperparameters persist across
fits — later fits start warm.  The knob lets those later fits spend a
reduced Adam budget; these tests pin the dispatch semantics (first fit
full budget, later fits warm budget) in both rollout runners.
"""
import jax
import jax.numpy as jnp
import numpy as np

from bayesian_cbf_tpu.experiments.unicycle import (
    make_ackermann_tracking_sim, STATE_START)
from bayesian_cbf_tpu.models import dynamics as dyn_mod
from bayesian_cbf_tpu.sim.rollout import (
    _simulate_unicycle_batch, scan_with_scheduled_fits, simulate_unicycle)


def _small_sim(**kw):
    kw.setdefault("numSteps", 50)
    kw.setdefault("dt", 0.01)
    kw.setdefault("max_train", 16)
    kw.setdefault("training_iter", 6)
    kw.setdefault("train_every_n_steps", 20)
    kw.setdefault("socp_iters", 20)
    return make_ackermann_tracking_sim(**kw)


def test_warm_refit_off_is_identity():
    lrn = _small_sim().learned_dynamics
    assert lrn.training_iter_warm == 0
    assert not lrn.warm_refits_differ
    # warm == full budget is also "off" (no second fit program compiled)
    assert not lrn._replace(
        training_iter_warm=lrn.training_iter).warm_refits_differ
    st = lrn.init_state(jax.random.PRNGKey(0))
    st = lrn.record(lrn.record(st, jnp.zeros(3), jnp.ones(2)),
                    0.1 * jnp.ones(3), jnp.ones(2))
    a = lrn.fit_now(st)
    b = lrn.fit_now_warm(st)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_batched_runner_budget_dispatch(monkeypatch):
    """Fit events after steps 15 and 30: the first spends training_iter,
    the second training_iter_warm.  (numSteps kept small: this test's
    3-segment batched program is the biggest compile in the suite tail,
    and the remote-compile service has twice hung on it in full-suite
    context while passing solo — shorter program, smaller target.)"""
    budgets = []
    orig = dyn_mod.LearnedShiftInvariantDynamics.fit_now

    def spy(self, state, training_iter=None):
        budgets.append(self.training_iter if training_iter is None
                       else training_iter)
        return orig(self, state, training_iter)

    monkeypatch.setattr(dyn_mod.LearnedShiftInvariantDynamics,
                        "fit_now", spy)
    sim = _small_sim(training_iter_warm=2, numSteps=31,
                     train_every_n_steps=15)
    x0s = jnp.broadcast_to(jnp.asarray(STATE_START), (2, 3))
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    out = jax.jit(lambda a, k: _simulate_unicycle_batch(sim, a, k))(
        x0s, keys)
    jax.block_until_ready(out.X)
    assert budgets == [6, 2]
    assert np.all(np.isfinite(np.asarray(out.X)))


def test_single_runner_budget_dispatch(monkeypatch):
    budgets = []
    orig = dyn_mod.LearnedShiftInvariantDynamics.fit_now

    def spy(self, state, training_iter=None):
        budgets.append(self.training_iter if training_iter is None
                       else training_iter)
        return orig(self, state, training_iter)

    monkeypatch.setattr(dyn_mod.LearnedShiftInvariantDynamics,
                        "fit_now", spy)
    sim = _small_sim(training_iter_warm=2)
    out = simulate_unicycle(sim, jnp.asarray(STATE_START))
    jax.block_until_ready(out.X)
    # the in-graph cond traces BOTH branches once: full then warm
    assert sorted(budgets) == [2, 6]
    assert np.all(np.isfinite(np.asarray(out.X)))


def test_pendulum_batch_runner_budget_dispatch(monkeypatch):
    """The pendulum segmented batch runner routes the first fit event to
    the full budget and later events to training_iter_warm, same as the
    unicycle batch runner."""
    from bayesian_cbf_tpu.experiments.pendulum import (
        make_pendulum_online_sim, run_pendulum_online_batch)

    budgets = []
    orig = dyn_mod.LearnedShiftInvariantDynamics.fit_now

    def spy(self, state, training_iter=None):
        budgets.append(self.training_iter if training_iter is None
                       else training_iter)
        return orig(self, state, training_iter)

    monkeypatch.setattr(dyn_mod.LearnedShiftInvariantDynamics,
                        "fit_now", spy)
    sim = make_pendulum_online_sim(
        numSteps=30, max_train=12, training_iter=5,
        train_every_n_steps=10, socp_iters=15, training_iter_warm=2)
    x0s = jnp.stack([jnp.array([2.0, 0.0]), jnp.array([1.9, 0.1])])
    X, U, Xdot, info = run_pendulum_online_batch(sim, x0s)
    # fit events at positive multiples of train_every strictly inside the
    # episode (fit_segments): steps 10 and 20 -> full budget, then warm
    assert budgets == [5, 2]
    assert np.all(np.isfinite(np.asarray(X)))


def test_scan_dispatch_first_vs_warm():
    """scan_with_scheduled_fits routes the first scheduled fit to fit_fn
    and later ones to fit_fn_warm (counter state, no GP involved)."""
    from typing import NamedTuple

    class St(NamedTuple):
        acc: jax.Array
        count_res: jax.Array

    def step(carry, t):
        (st,) = carry
        return (st,), st.acc

    fit = lambda s: s._replace(acc=s.acc + 100)
    fit_warm = lambda s: s._replace(acc=s.acc + 1)
    st0 = St(acc=jnp.zeros(()), count_res=jnp.ones((), jnp.int32))
    (st,), _ = scan_with_scheduled_fits(
        step, fit, (st0,), numSteps=7, train_every=2, enable=True,
        state_index=0, fit_fn_warm=fit_warm)
    # fits at t = 2, 4, 6: first full (+100), then two warm (+1)
    assert float(st.acc) == 102.0
    # without fit_fn_warm every fit uses fit_fn
    (st,), _ = scan_with_scheduled_fits(
        step, fit, (st0,), numSteps=7, train_every=2, enable=True,
        state_index=0)
    assert float(st.acc) == 300.0
