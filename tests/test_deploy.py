"""Deployment wrapper: AOT-compiled tick == the rollout scan, state
injection closes the loop, checkpoint round-trips (deploy.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from bayesian_cbf_tpu.deploy import CompiledController
from bayesian_cbf_tpu.experiments.unicycle import (
    make_ackermann_tracking_sim, STATE_START)
from bayesian_cbf_tpu.sim.rollout import simulate_unicycle


def _small_sim(**kw):
    return make_ackermann_tracking_sim(
        numSteps=24, dt=0.01, max_train=16, training_iter=5,
        train_every_n_steps=10, **kw)


def test_ticks_match_rollout_scan():
    """N deployment ticks reproduce the first N steps of the jitted
    rollout (same controls, same states)."""
    sim = _small_sim()
    key = jax.random.PRNGKey(0)
    out = simulate_unicycle(sim, STATE_START, key=key)
    ctl = CompiledController(sim, STATE_START, key=key)
    # the tick function is compiled standalone while the rollout compiles
    # a scan — XLA fuses them differently, and f64 rounding differences
    # amplify through the closed loop (measured ~1e-8 growing to ~1e-6
    # by t=13, with a ~5e-4 relative blip where a control crosses zero at
    # the refit step); 1e-3 separates "same trajectory" from any
    # schedule/data off-by-one, which diverges at O(1) within a step
    for t in range(12):
        u, info = ctl.tick()
        np.testing.assert_allclose(u, np.asarray(out.U[t]), rtol=1e-3,
                                   atol=1e-3,
                                   err_msg="tick %d control mismatch" % t)
    assert ctl.t == 12


def test_measured_state_injection():
    """Injecting the plant state overrides the model-propagated one."""
    sim = _small_sim()
    ctl = CompiledController(sim, STATE_START)
    ctl.tick()
    x_meas = np.asarray(STATE_START) + np.array([0.3, -0.2, 0.1])
    u, info = ctl.tick(x_measured=x_meas)
    # the carry's propagated state must now be one Euler step FROM the
    # injected state, not from the internal one
    x_next = np.asarray(ctl.state()[0])
    x_ref, _ = sim.true_dynamics.step(jnp.asarray(x_meas, x_next.dtype),
                                      jnp.asarray(u, x_next.dtype), sim.dt)
    np.testing.assert_allclose(x_next, np.asarray(x_ref), rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from bayesian_cbf_tpu.observability.logger import (save_checkpoint,
                                                       load_checkpoint)
    sim = _small_sim()
    ctl = CompiledController(sim, STATE_START)
    for _ in range(5):
        ctl.tick()
    snap = ctl.state()
    path = str(tmp_path / "carry.npz")
    save_checkpoint(path, snap)
    u6, _ = ctl.tick()

    ctl2 = CompiledController(sim, STATE_START)
    ctl2.restore(load_checkpoint(path, like=snap))
    ctl2._t = 5
    u6b, _ = ctl2.tick()
    np.testing.assert_allclose(u6b, u6, rtol=1e-6)


def test_state_snapshot_survives_next_tick():
    """ADVICE r2: state() must return a defensive copy — the live carry
    is donated to the next tick, which deletes its buffers."""
    sim = _small_sim()
    ctl = CompiledController(sim, STATE_START)
    ctl.tick()
    snap = ctl.state()
    ctl.tick()          # donates the live carry
    # the snapshot must still be readable (would raise 'Array has been
    # deleted' before the fix)
    vals = [np.asarray(l) for l in jax.tree.leaves(snap)]
    assert all(np.all(np.isfinite(v)) or v.dtype.kind in "ib"
               for v in vals)


def test_failed_tick_leaves_explicit_needs_restore_state():
    """If the compiled tick raises after the carry was donated, the
    controller must refuse further ticks until restore() instead of
    holding invalidated buffers."""
    import pytest
    sim = _small_sim()
    ctl = CompiledController(sim, STATE_START)
    ctl.tick()
    snap = ctl.state()

    class _Boom(RuntimeError):
        pass

    real = ctl._compiled

    def boom(*a, **k):
        raise _Boom("transient device error")

    ctl._compiled = boom
    with pytest.raises(_Boom):
        ctl.tick()
    ctl._compiled = real
    with pytest.raises(RuntimeError, match="restore"):
        ctl.tick()
    with pytest.raises(RuntimeError, match="restore"):
        ctl.state()
    ctl.restore(snap)
    u, _ = ctl.tick()
    assert np.all(np.isfinite(u))


def test_serving_continuous_updates_tracks_refresh():
    """Round-3 directive 5: continuous_updates=True in the serving path —
    every tick rank-1-appends the observed sample into the GP cache, and
    after N ticks the cache matches a full refresh_cache of the same
    buffer (reference cache semantics: control_affine_model.py:379-395,
    which can only refresh in full)."""
    sim = make_ackermann_tracking_sim(
        numSteps=40, dt=0.01, max_train=32, training_iter=4,
        train_every_n_steps=1000)       # no scheduled refit in this window
    ctl = CompiledController(sim, STATE_START, continuous_updates=True)
    for _ in range(12):
        u, info = ctl.tick()
        assert np.all(np.isfinite(u))
    st = ctl.state()[1]
    gp = sim.learned_dynamics.gp
    full = gp.refresh_cache(st.params, st.buf)
    # ticks 2..12 appended ~11 samples one at a time
    assert float(jnp.sum(st.buf.mask)) >= 10
    # factor parity is bounded by the Gram-nugget drift across appends
    # (each append bakes its tick's dtype-aware nugget into its row;
    # refresh applies the final nugget uniformly — see
    # MVGP.cache_append), amplified by sqrt(cond) of the near-singular
    # ring-buffer Gram (kappa ~ 2e8 here): observed ~1.6e-7 in f64.
    np.testing.assert_allclose(np.asarray(st.cache.L),
                               np.asarray(full.L), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.cache.alpha),
                               np.asarray(full.alpha), rtol=1e-6, atol=1e-6)
    # the appended cache must actually be USED: posterior mean from the
    # carry cache equals the full-refresh posterior
    x = np.asarray(ctl.state()[0])
    m1 = gp.fu_mean(st.params, st.buf, st.cache,
                    jnp.zeros(sim.learned_dynamics.gp.u_dim), jnp.asarray(x))
    m2 = gp.fu_mean(st.params, st.buf, full,
                    jnp.zeros(sim.learned_dynamics.gp.u_dim), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)


def test_serving_continuous_updates_with_refit_crossing():
    """Appends + a scheduled refit interleave cleanly: crossing the
    refit tick keeps the cache consistent with the post-fit params."""
    sim = make_ackermann_tracking_sim(
        numSteps=40, dt=0.01, max_train=16, training_iter=3,
        train_every_n_steps=8)
    ctl = CompiledController(sim, STATE_START, continuous_updates=True)
    for _ in range(12):                  # crosses the refit at t=8
        u, info = ctl.tick()
        assert np.all(np.isfinite(u))
    st = ctl.state()[1]
    gp = sim.learned_dynamics.gp
    full = gp.refresh_cache(st.params, st.data)
    np.testing.assert_allclose(np.asarray(st.cache.L),
                               np.asarray(full.L), rtol=1e-6, atol=1e-8)
