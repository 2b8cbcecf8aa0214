"""Posterior-level pin for the warm-refit default (round-3 verdict 8).

The warm-budget default (training_iter_warm) was adopted on qualitative
outcome equivalence while the final fitted HYPERPARAMETERS differ wildly
between budgets (records warm_refit_iters_ab) — so this pins the level
that actually matters: the posterior predictions the controller
consumes.  Measured at this config (CPU f64): posterior mean maxdiff
~0.05 = 5% of the mean-prediction scale and 0.29x the max posterior
std; warm posterior std is ~1.8x the full-budget std (MORE conservative
— wider cones, the fail-safe direction).  Bounds are ~3x those
measurements; the flagship-scale on-chip record lives in
records/tpu_round4.jsonl (warm_posterior_pin).

Reference fit-budget semantics: bayes_cbf/control_affine_model.py:268
(training_iter=100 every refit).
"""
import jax
import jax.numpy as jnp
import numpy as np

from bayesian_cbf_tpu.experiments.unicycle import (
    make_ackermann_tracking_sim, STATE_START)
from bayesian_cbf_tpu.sim.rollout import simulate_unicycle_with_state


def _run(warm_iters):
    sim = make_ackermann_tracking_sim(
        dt=0.01, numSteps=150, true_L=1.0, mean_L=12.0,
        kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01,
        enable_learning=True, train_every_n_steps=50,
        max_train=32, training_iter=25, socp_iters=25,
        training_iter_warm=warm_iters)
    out, carry = simulate_unicycle_with_state(sim, STATE_START)
    return sim, out, carry[1]


def test_warm_refit_posterior_close_to_full_budget():
    sim_w, out_w, st_w = _run(10)
    sim_f, out_f, st_f = _run(0)
    gp = sim_f.learned_dynamics.gp

    Xg = out_f.X[::4]

    def posterior(st, x):
        FT = gp.fT_post(st.params, st.data, st.cache, x)
        Bk = gp.Bk_single(st.params, st.data, st.cache, x, x)
        A = st.params.A
        std = jnp.sqrt(jnp.maximum(
            jnp.diag(A)[:, None] * jnp.diag(Bk)[None, :], 0.0))
        return FT, std

    post = jax.jit(jax.vmap(posterior, in_axes=(None, 0)))
    FT_w, std_w = post(st_w, Xg)
    FT_f, std_f = post(st_f, Xg)

    mean_abs = float(jnp.max(jnp.abs(FT_w - FT_f)))
    mscale = float(jnp.max(jnp.abs(FT_f)))
    assert mean_abs < 0.2 * mscale, (mean_abs, mscale)
    # warm uncertainty must bracket the full-budget one: never more than
    # 2x NARROWER (unsafely confident), at most ~6x wider
    ratio = np.asarray((std_w + 1e-12) / (std_f + 1e-12), np.float64)
    assert ratio.min() > 0.5, ratio.min()
    assert ratio.max() < 6.0, ratio.max()
    # and the episodes end in the same place (outcome equivalence)
    gw = float(jnp.linalg.norm(out_w.X[-1, :2]))
    gf = float(jnp.linalg.norm(out_f.X[-1, :2]))
    assert abs(gw - gf) < 0.5, (gw, gf)
