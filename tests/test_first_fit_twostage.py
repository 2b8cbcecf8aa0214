"""Two-stage first fit: coarse subsample stage + full-K warm refine.

The cold-start fit is load-bearing in BUDGET (records first_fit_iters_ab:
cutting training_iter degrades goal-reaching monotonically) but not in
per-iteration data size — its job is finding the lengthscale/task-matrix
regime, which a stride-2 subsample of the reservoir determines equally
well at ~1/8 the Gram FLOPs.  first_fit_coarse_stride spends the full
Adam budget on buf[::stride] then warm-refines at full K
(first_fit_refine_iter), exactly the warm-refit program that
records/tpu_round3.jsonl (warm_refit_iters_ab) showed is outcome-neutral
near an optimum.  These tests pin the dispatch semantics and the
off-is-identity contract in both rollout runners.
"""
import jax
import jax.numpy as jnp
import numpy as np

from bayesian_cbf_tpu.experiments.unicycle import (
    make_ackermann_tracking_sim, STATE_START)
from bayesian_cbf_tpu.models import mvgp as mvgp_mod
from bayesian_cbf_tpu.sim.rollout import _simulate_unicycle_batch


def _small_sim(**kw):
    kw.setdefault("numSteps", 50)
    kw.setdefault("dt", 0.01)
    kw.setdefault("max_train", 16)
    kw.setdefault("training_iter", 6)
    kw.setdefault("train_every_n_steps", 20)
    kw.setdefault("socp_iters", 20)
    return make_ackermann_tracking_sim(**kw)


def _filled_state(lrn, n_rows=20):
    st = lrn.init_state(jax.random.PRNGKey(0))
    x = jnp.zeros(3)
    for i in range(n_rows):
        u = jnp.asarray([1.0, 0.1 * (i % 3)])
        st = lrn.record(st, x, u)
        x = x + 0.01 * jnp.asarray([jnp.cos(x[2]), jnp.sin(x[2]), u[1]])
    return st


def test_twostage_off_is_fit_now():
    lrn = _small_sim().learned_dynamics
    assert lrn.first_fit_coarse_stride == 0
    assert not lrn.first_fit_twostage
    # stride 1 is also off (subsample would be the full buffer)
    assert not lrn._replace(first_fit_coarse_stride=1).first_fit_twostage
    st = _filled_state(lrn)
    a = lrn.fit_now_first(st)
    b = lrn.fit_now(st)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_twostage_budgets_and_shapes(monkeypatch):
    """Stage 1 sees K/stride rows at the full budget; stage 2 the full K
    at the refine budget."""
    calls = []
    orig = mvgp_mod.MVGP.fit

    def spy(self, params, data, training_iter=50, lr=0.1):
        calls.append((int(data.X.shape[0]), int(training_iter)))
        return orig(self, params, data, training_iter=training_iter, lr=lr)

    monkeypatch.setattr(mvgp_mod.MVGP, "fit", spy)
    lrn = _small_sim(first_fit_coarse_stride=2,
                     first_fit_refine_iter=3).learned_dynamics
    assert lrn.first_fit_twostage and lrn.first_fit_differs
    st = _filled_state(lrn)
    out = lrn.fit_now_first(st)
    assert calls == [(8, 6), (16, 3)]
    for leaf in jax.tree.leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # the refreshed cache is at full K and magnitude-sane
    assert out.cache.Linv.shape == (16, 16)
    assert float(jnp.max(jnp.abs(out.cache.Linv))) < 1e6


def test_twostage_batched_runner_dispatch(monkeypatch):
    """First fit event runs the two-stage program (2 MVGP.fit calls:
    subsampled full-budget + full-K refine); the second event runs the
    warm budget once."""
    calls = []
    orig = mvgp_mod.MVGP.fit

    def spy(self, params, data, training_iter=50, lr=0.1):
        calls.append((int(data.X.shape[0]), int(training_iter)))
        return orig(self, params, data, training_iter=training_iter, lr=lr)

    monkeypatch.setattr(mvgp_mod.MVGP, "fit", spy)
    sim = _small_sim(training_iter_warm=2, numSteps=31,
                     train_every_n_steps=15,
                     first_fit_coarse_stride=2, first_fit_refine_iter=3)
    x0s = jnp.broadcast_to(jnp.asarray(STATE_START), (2, 3))
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    out = jax.jit(lambda a, k: _simulate_unicycle_batch(sim, a, k))(
        x0s, keys)
    jax.block_until_ready(out.X)
    assert calls == [(8, 6), (16, 3), (16, 2)]
    assert np.all(np.isfinite(np.asarray(out.X)))
