#!/usr/bin/env python
"""Pin the warm-refit default at the POSTERIOR level (round-3 verdict 8).

The warm=10 default rests on qualitative outcome equivalence, but the
final fitted hyperparameters "differ wildly between budgets"
(records warm_refit_iters_ab).  This script runs the flagship episode
twice — training_iter_warm=10 vs full-budget refits — and compares the
POSTERIOR PREDICTIONS (mean/std of F(x)) of the two end-of-episode
models on the realized trajectory, plus the realized chance-constraint
margins, so the equivalence claim is quantitative: hyperparameters are
not identifiable (flat MLL directions), posterior predictions on the
data region are what the controller consumes.

Writes one JSON line (append to records/ on chip).
Env: PIN_STEPS/PIN_MAX_TRAIN/PIN_TRAIN_EVERY/PIN_ITERS/PIN_WARM.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE", "/tmp/jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np


def main():
    if os.environ.get("PIN_CPU"):
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    platform = jax.devices()[0].platform

    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START, realized_cbc_margins)
    from bayesian_cbf_tpu.sim.rollout import simulate_unicycle_with_state

    steps = int(os.environ.get("PIN_STEPS", "2000"))
    max_train = int(os.environ.get("PIN_MAX_TRAIN", "200"))
    train_every = int(os.environ.get("PIN_TRAIN_EVERY", "400"))
    iters = int(os.environ.get("PIN_ITERS", "100"))
    warm = int(os.environ.get("PIN_WARM", "10"))
    dt = float(os.environ.get("PIN_DT", "0.001"))

    def run(warm_iters):
        sim = make_ackermann_tracking_sim(
            dt=dt, numSteps=steps, true_L=1.0, mean_L=12.0,
            kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01,
            enable_learning=True, train_every_n_steps=train_every,
            max_train=max_train, training_iter=iters,
            socp_iters=25, training_iter_warm=warm_iters)
        out, carry = simulate_unicycle_with_state(sim, STATE_START)
        return sim, out, carry[1]          # carry[1] = LearnedDynState

    t0 = time.time()
    sim_w, out_w, st_w = run(warm)
    sim_f, out_f, st_f = run(0)

    gp = sim_f.learned_dynamics.gp
    # evaluation grid: the realized full-budget trajectory (the region the
    # controller actually consumes posteriors on), subsampled
    Xg = out_f.X[:: max(steps // 64, 1)]
    mh = 1 + gp.u_dim

    def posterior(st, x):
        FT = gp.fT_post(st.params, st.data, st.cache, x)       # (n, 1+m)
        Bk = gp.Bk_single(st.params, st.data, st.cache, x, x)  # (1+m, 1+m)
        A = st.params.A
        # per-entry std of F^T: sqrt(diag(Bk) outer diag(A))
        std = jnp.sqrt(jnp.maximum(
            jnp.diag(A)[:, None] * jnp.diag(Bk)[None, :], 0.0))
        return FT, std

    post = jax.jit(jax.vmap(posterior, in_axes=(None, 0)))
    FT_w, std_w = post(st_w, Xg)
    FT_f, std_f = post(st_f, Xg)

    scale = float(jnp.maximum(jnp.max(std_f), 1e-12))
    mean_abs = float(jnp.max(jnp.abs(FT_w - FT_f)))
    mean_rel_to_std = mean_abs / scale
    # also relative to the MEAN PREDICTION scale (what enters the cones)
    mscale = float(jnp.max(jnp.abs(FT_f)) + 1e-12)
    std_ratio = np.asarray(
        (std_w + 1e-12) / (std_f + 1e-12), np.float64)

    # realized chance-constraint margins along each run's own trajectory,
    # evaluated under that run's FINAL posterior (realized_cbc_margins
    # uses the initial prior for learning sims, which would hide
    # warm-vs-full model differences entirely)
    from bayesian_cbf_tpu.control.bayes_controller import (
        chance_constraint_margins)

    def margins(sim, out, st):
        def one(x, u, t):
            mom = sim.learned_dynamics.moments(st, x)
            mg = chance_constraint_margins(sim.controller, sim.clf,
                                           sim.cbfs, sim.planner,
                                           mom, x, t, u)
            return mg[1:]                       # drop the relaxed CLC row
        ts = jnp.arange(out.X.shape[0])
        return np.asarray(jax.jit(jax.vmap(one))(out.X, out.U, ts))

    marg_w = margins(sim_w, out_w, st_w)
    marg_f = margins(sim_f, out_f, st_f)

    rec = {
        "item": "warm_posterior_pin",
        "platform": platform,
        "config": {"steps": steps, "max_train": max_train,
                   "train_every": train_every, "iters": iters,
                   "warm": warm, "dt": dt},
        "posterior_mean_maxdiff": round(mean_abs, 6),
        "posterior_mean_maxdiff_over_max_std": round(mean_rel_to_std, 4),
        "posterior_mean_maxdiff_over_mean_scale":
            round(mean_abs / mscale, 6),
        "std_ratio_minmax": [round(float(std_ratio.min()), 4),
                             round(float(std_ratio.max()), 4)],
        "min_realized_margin_warm": round(float(marg_w.min()), 5),
        "min_realized_margin_full": round(float(marg_f.min()), 5),
        "goal_dist_warm": round(float(jnp.linalg.norm(
            out_w.X[-1, :2])), 4),
        "goal_dist_full": round(float(jnp.linalg.norm(
            out_f.X[-1, :2])), 4),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
