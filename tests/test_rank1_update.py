"""Rank-1 Cholesky append update vs full refresh (new capability)."""
import jax
import jax.numpy as jnp
import numpy as np

from bayesian_cbf_tpu.models import make_mvgp


def test_cache_append_matches_refresh():
    n, m, cap = 2, 1, 12
    rng = np.random.default_rng(0)
    gp = make_mvgp(n, m)
    params = gp.init_params(jax.random.PRNGKey(0))
    data = gp.empty_data(cap)

    cache = gp.refresh_cache(params, data)
    xq = jnp.asarray(rng.normal(size=(n,)))
    uq = jnp.asarray(rng.normal(size=(m,)))

    for slot in range(6):
        x = rng.normal(size=n)
        u = rng.normal(size=m)
        xdot = rng.normal(size=n)
        uh = np.concatenate([[1.0], u])
        data = data._replace(
            X=data.X.at[slot].set(jnp.asarray(x)),
            UH=data.UH.at[slot].set(jnp.asarray(uh)),
            Xdot=data.Xdot.at[slot].set(jnp.asarray(xdot)),
            mask=data.mask.at[slot].set(1.0))
        cache = gp.cache_append(params, data, cache, slot)
        full = gp.refresh_cache(params, data)
        np.testing.assert_allclose(np.asarray(cache.L), np.asarray(full.L),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(gp.fu_mean(params, data, cache, uq, xq)),
            np.asarray(gp.fu_mean(params, data, full, uq, xq)),
            rtol=1e-8)


def test_continuous_updates_rollout_runs():
    """LearnedShiftInvariantDynamics with continuous_updates: the posterior
    tracks every sample; short rollout stays finite."""
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    from bayesian_cbf_tpu.sim.rollout import simulate_unicycle
    sim = make_ackermann_tracking_sim(numSteps=30, dt=0.01, max_train=8,
                                      training_iter=4,
                                      train_every_n_steps=10, socp_iters=15)
    sim = sim._replace(learned_dynamics=sim.learned_dynamics._replace(
        continuous_updates=True))
    out = simulate_unicycle(sim, STATE_START)
    assert bool(jnp.all(jnp.isfinite(out.X)))
    assert bool(jnp.all(jnp.isfinite(out.U)))


def test_cache_append_row_matches_refresh_and_append():
    """The batched-rollout row append (cache_append_row: O(K) gram row,
    matmul-only alpha, row-gated writes) reproduces both refresh_cache
    and the serving cache_append on a growing prefix, and a write=False
    call is a strict no-op."""
    from bayesian_cbf_tpu.models.mvgp import make_mvgp
    gp = make_mvgp(2, 1)
    K = 12
    rng = np.random.default_rng(0)
    params = gp.init_params(jax.random.PRNGKey(1))
    data = gp.empty_data(K)
    cache = gp.empty_cache(K)
    old = gp.empty_cache(K)
    for i in range(8):
        data = data._replace(
            X=data.X.at[i].set(jnp.asarray(rng.normal(size=2))),
            UH=data.UH.at[i].set(jnp.asarray([1.0, rng.normal()])),
            Xdot=data.Xdot.at[i].set(jnp.asarray(rng.normal(size=2))),
            mask=data.mask.at[i].set(1.0))
        cache = gp.cache_append_row(params, data, cache,
                                    jnp.asarray(i), jnp.asarray(True))
        old = gp.cache_append(params, data, old, jnp.asarray(i))
    ref = gp.refresh_cache(params, data)
    np.testing.assert_allclose(np.asarray(cache.L), np.asarray(ref.L),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cache.Linv), np.asarray(ref.Linv),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cache.alpha),
                               np.asarray(ref.alpha), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(cache.L), np.asarray(old.L),
                               rtol=1e-9, atol=1e-12)
    noop = gp.cache_append_row(params, data, cache, jnp.asarray(9),
                               jnp.asarray(False))
    for a, b in zip(jax.tree.leaves(noop), jax.tree.leaves(cache)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
