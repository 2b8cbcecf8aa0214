#!/usr/bin/env python
"""Diagnose the f32 warm-start feasibility regression on the real chip and
re-measure the phase breakdown after the fit/Linv optimizations."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_cbf_tpu.experiments.unicycle import (
    make_ackermann_tracking_sim, min_obstacle_clearance, goal_distance,
    unicycle_mean_cbf_collides_obstacle,
    unicycle_learning_helps_avoid_getting_stuck, STATE_START)
from bayesian_cbf_tpu.sim.rollout import simulate_unicycle

print("platform:", jax.devices()[0].platform, flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "outcomes"):
    for label, fn in [("mean_cbf", unicycle_mean_cbf_collides_obstacle),
                      ("learning", unicycle_learning_helps_avoid_getting_stuck)]:
        for mode, kw in [("cold", dict(warm_start=False)),
                         ("warm10", dict(warm_start=True, socp_iters_warm=10)),
                         ("warm15", dict(warm_start=True, socp_iters_warm=15))]:
            sim, out = fn(**kw)
            rec = {
                "item": f"{label}_{mode}",
                "feasible": round(float(np.mean(np.asarray(out.info.feasible))), 4),
                "min_clear": round(float(np.min(np.asarray(
                    min_obstacle_clearance(sim, out)))), 4),
                "goal_dist": round(float(np.asarray(goal_distance(out))), 4),
                "max_pres": round(float(np.max(np.asarray(out.info.pres))), 5),
                "med_pres": round(float(np.median(np.asarray(out.info.pres))), 6),
            }
            print(json.dumps(rec), flush=True)

if which in ("all", "phases"):
    from bayesian_cbf_tpu.sim.rollout import _simulate_unicycle_batch
    batch, steps = 256, 800
    base = dict(dt=0.001, numSteps=steps, true_L=1.0, mean_L=12.0,
                kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01,
                enable_learning=True, train_every_n_steps=400,
                max_train=200, training_iter=100, socp_iters=25,
                warm_start=True, socp_iters_warm=10)
    x0 = jnp.asarray(STATE_START, jnp.float32)
    x0s = x0[None, :] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (batch, 3), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), batch)

    def measure(**kw):
        cfg = dict(base)
        cfg.update(kw)
        sim = make_ackermann_tracking_sim(**cfg)
        run = jax.jit(lambda a, k: _simulate_unicycle_batch(sim, a, k))
        out = run(x0s, keys)
        jax.block_until_ready(out.X)
        t0 = time.perf_counter()
        for _ in range(3):
            out = run(x0s, keys)
            jax.block_until_ready(out.X)
        return (time.perf_counter() - t0) / 3

    res = {"item": "phase_breakdown_v2"}
    res["full_warm10"] = round(measure(), 4)
    res["cold25"] = round(measure(warm_start=False), 4)
    res["no_refit"] = round(measure(train_every_n_steps=10 ** 6), 4)
    res["no_learning"] = round(measure(enable_learning=False), 4)
    res["steps_per_sec_full"] = round(batch * steps / res["full_warm10"], 1)
    print(json.dumps(res), flush=True)
