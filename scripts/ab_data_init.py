#!/usr/bin/env python
"""On-chip A/B for the data-driven first-fit init (heuristic_init ridge
mean) combined with a reduced FIRST-fit Adam budget, at the gated
warm-refit default (training_iter_warm=10).

Records `first_fit_iters_ab` measured that COLD-started reduced first
budgets reach 415k/502k steps/s at training_iter=50/25 but degrade the
learning outcomes (batched-256 frac goal<1: 1.0/0.988/0.453).  The CPU
f64 full-scale pre-validation (NOTES_round3) shows the ridge-mean init
closes that gap: data50 goal 0.5252 (full-budget 0.5233), data25 0.5699.
This script is the on-chip gate for adopting it:

  1. single-episode flagship learning outcome per config,
  2. batched-256 learning outcomes (the round-3 fit-inversion regression
     was only visible on the batched path),
  3. flagship batched wall (steps/s, ONE process, host-fetch fenced,
     best-of-3 — CLAUDE.md timing rules).

Configs: (100, cold) control, (50, data-init), (25, data-init).
Prints one JSON blob; the reviewed result goes to
records/tpu_round3.jsonl as `data_init_first_fit_ab`.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np


WARM = int(os.environ.get("AB_WARM", "10"))
# (training_iter, first_fit_data_init) pairs
CONFIGS = [(100, False), (50, True), (25, True)]
if os.environ.get("AB_CONFIGS"):
    CONFIGS = [(int(s.split(":")[0]), s.split(":")[1] == "data")
               for s in os.environ["AB_CONFIGS"].split(",")]


def _wait_for_backend(attempts=10, sleep_s=60):
    for i in range(attempts):
        try:
            return jax.devices()
        except RuntimeError as e:
            print(json.dumps({"backend_retry": i, "err": str(e)[:120]}),
                  file=sys.stderr, flush=True)
            time.sleep(sleep_s)
    return jax.devices()


def _tag(f, di):
    return f"{f}_{'data' if di else 'cold'}"


def main():
    _wait_for_backend()
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START, STATE_GOAL,
        unicycle_learning_helps_avoid_getting_stuck,
        min_obstacle_clearance, goal_distance)
    from bayesian_cbf_tpu.sim.rollout import _simulate_unicycle_batch

    out = {"configs": [_tag(f, d) for f, d in CONFIGS], "warm": WARM}
    t_start = time.time()

    # --- 1. single-episode flagship learning outcome per config ---
    uni = {}
    for f, di in CONFIGS:
        sim, ro = unicycle_learning_helps_avoid_getting_stuck(
            training_iter=f, training_iter_warm=WARM,
            first_fit_data_init=di)
        uni[_tag(f, di)] = {
            "goal_dist": round(float(np.asarray(goal_distance(ro))), 4),
            "min_clearance": round(float(jnp.min(jnp.asarray(
                min_obstacle_clearance(sim, ro)))), 4),
            "feasible": round(float(ro.info.feasible.mean()), 4),
        }
    out["unicycle_learning"] = uni

    # --- 2+3. batched bench + batched learning outcomes, one process ---
    batch = int(os.environ.get("AB_BATCH", "256"))
    num_steps = 2000
    dtype = jnp.float32
    x0 = jnp.asarray(STATE_START, dtype)
    goal = np.asarray(STATE_GOAL, np.float64)
    x0s = x0[None, :] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (batch, 3), dtype)
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    bench = {}
    for f, di in CONFIGS:
        sim = make_ackermann_tracking_sim(
            dt=0.001, numSteps=num_steps, true_L=1.0, mean_L=12.0,
            kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01,
            enable_learning=True, train_every_n_steps=400,
            max_train=200, training_iter=f, socp_iters=25,
            warm_start=True, socp_iters_warm=15, training_iter_warm=WARM,
            first_fit_data_init=di)
        run = jax.jit(lambda a, k, s=sim: _simulate_unicycle_batch(s, a, k))
        o = run(x0s, keys)
        float(jnp.sum(o.X))  # fence (block_until_ready unreliable here)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = run(x0s, keys)
            float(jnp.sum(o.X))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        X = np.asarray(o.X, np.float64)              # (B, T, 3)
        gd = np.linalg.norm(X[:, -1, :2] - goal[None, :2], axis=-1)
        clear = np.inf
        for cbf in sim.cbfs:
            c = np.asarray(cbf.center, np.float64)
            r = float(cbf.radius)
            d = np.linalg.norm(X[:, :, :2] - c[None, None], axis=-1) - r
            clear = min(clear, float(d.min()))
        bench[_tag(f, di)] = {
            "wall_s": round(wall, 4),
            "steps_per_sec": round(batch * num_steps / wall, 1),
            "finite": bool(np.all(np.isfinite(X))),
            "batched_mean_goal": round(float(gd.mean()), 4),
            "batched_frac_goal_lt_1": round(float((gd < 1.0).mean()), 4),
            "batched_min_clearance": round(clear, 4),
        }
    out["bench_flagship_batch%d" % batch] = bench

    # --- verdicts: every config must preserve the qualitative outcomes
    # on BOTH the single-episode and the batched path ---
    ok = {}
    for f, di in CONFIGS:
        t = _tag(f, di)
        ok[t] = bool(
            uni[t]["goal_dist"] < 1.5 and uni[t]["min_clearance"] > 0
            and bench[t]["finite"]
            and bench[t]["batched_mean_goal"] < 1.0
            and bench[t]["batched_frac_goal_lt_1"] >= 0.99
            and bench[t]["batched_min_clearance"] > 0)
    out["verdicts"] = ok
    out["all_pass"] = all(ok.values())
    out["wall_s_total"] = round(time.time() - t_start, 1)
    print(json.dumps(out))
    return 0 if out["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
