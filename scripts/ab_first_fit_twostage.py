#!/usr/bin/env python
"""On-chip A/B for the TWO-STAGE first fit (first_fit_coarse_stride).

records `first_fit_iters_ab` pinned that the cold-start fit's 100 Adam
iterations are load-bearing (cutting the BUDGET degrades goal-reaching
monotonically), leaving "a legitimate first-fit cut" worth ~100-200k
steps/s (`data_init_first_fit_ab` control rows).  The two-stage design
keeps the budget but shrinks the per-iteration cost: stage 1 spends the
full 100 iterations on the stride-subsampled reservoir (K/stride rows,
~stride^3 fewer Gram FLOPs/iter), stage 2 warm-refines at full K for 15
iterations — exactly the warm-refit program proven outcome-neutral near
an optimum (`warm_refit_iters_ab`).

Measures, per stride in {0 (control), 2, 3}:
  1. single-episode flagship learning outcome (goal/clearance/feasible),
  2. batched-256 learning outcomes (the round-3 fit regression was
     batched-path-only, so any fit change must be gated there),
  3. flagship batched wall (ONE process, host-fetch fenced, best-of-3).

Prints one JSON blob; the reviewed result goes to
records/tpu_round5.jsonl as `first_fit_twostage_ab`.
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


STRIDES = tuple(int(w) for w in
                os.environ.get("AB_STRIDES", "0,2,3").split(","))
REFINE = int(os.environ.get("AB_REFINE", "15"))
WARM = int(os.environ.get("AB_WARM", "10"))


def _wait_for_backend(attempts=10, sleep_s=60):
    for i in range(attempts):
        try:
            return jax.devices()
        except RuntimeError as e:
            print(json.dumps({"backend_retry": i, "err": str(e)[:120]}),
                  file=sys.stderr, flush=True)
            time.sleep(sleep_s)
    return jax.devices()


def main():
    _wait_for_backend()
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START, STATE_GOAL,
        unicycle_learning_helps_avoid_getting_stuck,
        min_obstacle_clearance, goal_distance)
    from bayesian_cbf_tpu.sim.rollout import _simulate_unicycle_batch

    out = {"strides": list(STRIDES), "refine": REFINE, "warm": WARM}
    t_start = time.time()

    # --- 1. single-episode flagship learning outcome per stride ---
    uni = {}
    for s in STRIDES:
        sim, ro = unicycle_learning_helps_avoid_getting_stuck(
            training_iter_warm=WARM, first_fit_coarse_stride=s,
            first_fit_refine_iter=REFINE)
        uni[s] = {
            "goal_dist": round(float(np.asarray(goal_distance(ro))), 4),
            "min_clearance": round(float(jnp.min(jnp.asarray(
                min_obstacle_clearance(sim, ro)))), 4),
            "feasible": round(float(ro.info.feasible.mean()), 4),
        }
    out["unicycle_learning"] = {str(k): v for k, v in uni.items()}

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
    for s in STRIDES:
        sim = make_ackermann_tracking_sim(
            dt=0.001, numSteps=num_steps, true_L=1.0, mean_L=12.0,
            kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01,
            enable_learning=True, train_every_n_steps=400,
            max_train=200, training_iter=100, socp_iters=25,
            warm_start=True, socp_iters_warm=15, training_iter_warm=WARM,
            first_fit_coarse_stride=s, first_fit_refine_iter=REFINE)
        run = jax.jit(lambda a, k, s_=sim: _simulate_unicycle_batch(s_, a, k))
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
        bench[s] = {
            "wall_s": round(wall, 4),
            "steps_per_sec": round(batch * num_steps / wall, 1),
            "finite": bool(np.all(np.isfinite(X))),
            "batched_mean_goal": round(float(gd.mean()), 4),
            "batched_frac_goal_lt_1": round(float((gd < 1.0).mean()), 4),
            "batched_min_clearance": round(clear, 4),
        }
    out["bench_flagship_batch%d" % batch] = {
        str(k): v for k, v in bench.items()}

    # --- verdicts: every stride must preserve the qualitative outcomes
    # on BOTH the single-episode and the batched path ---
    ok = {}
    for s in STRIDES:
        ok[str(s)] = bool(
            uni[s]["goal_dist"] < 1.5 and uni[s]["min_clearance"] > 0
            and bench[s]["finite"]
            and bench[s]["batched_mean_goal"] < 1.0
            and bench[s]["batched_frac_goal_lt_1"] >= 0.99
            and bench[s]["batched_min_clearance"] > 0)
    out["verdicts"] = ok
    out["all_pass"] = all(ok.values())
    out["wall_s_total"] = round(time.time() - t_start, 1)
    print(json.dumps(out))
    return 0 if out["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
