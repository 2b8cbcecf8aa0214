#!/usr/bin/env python
"""On-chip A/B for the fit LR schedule x reduced FIRST-fit budget, at the
gated warm-refit default (training_iter_warm=10).

Motivation: cold-started reduced first budgets on the reference multistep
schedule degrade batched learning outcomes only marginally at 50 iters
(frac goal<1 = 0.9883, records first_fit_iters_ab) — and the multistep
schedule spends 70% of a short budget below the peak lr, so a cosine
schedule (2*lr peak, smooth decay) may close the gap.  CPU f64 full-scale
pre-validation: cosine@50 and cosine@35 goal 0.5230/0.5232 vs full-budget
0.5233 (NOTES_round3).  The mean-init lever is a measured no-op
(records data_init_first_fit_ab), so the schedule is the remaining
first-fit lever.

Measures per config: single-episode flagship outcome, batched-256
outcomes, flagship wall (one process, host-fetch fenced, best-of-3), and
the pendulum online episode's damage/wedge (the schedule knob applies to
EVERY fit, so the rel-deg-2 stack must be checked before adoption).

Prints one JSON blob; the reviewed result goes to
records/tpu_round3.jsonl as `fit_schedule_ab`.
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
# (training_iter, schedule) pairs; multistep@100 is the adopted control
CONFIGS = [(100, "multistep"), (50, "cosine"), (35, "cosine")]
if os.environ.get("AB_CONFIGS"):
    CONFIGS = [(int(s.split(":")[0]), s.split(":")[1])
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


def _tag(f, sch):
    return f"{f}_{sch}"


def main():
    _wait_for_backend()
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START, STATE_GOAL,
        unicycle_learning_helps_avoid_getting_stuck,
        min_obstacle_clearance, goal_distance)
    from bayesian_cbf_tpu.experiments.pendulum import (
        make_pendulum_online_sim, run_pendulum_online_learning,
        pendulum_damage_fraction, pendulum_wedge_fraction)
    from bayesian_cbf_tpu.sim.rollout import _simulate_unicycle_batch

    out = {"configs": [_tag(f, s) for f, s in CONFIGS], "warm": WARM}
    t_start = time.time()

    # --- 1. single-episode flagship learning outcome per config ---
    uni = {}
    for f, sch in CONFIGS:
        sim, ro = unicycle_learning_helps_avoid_getting_stuck(
            training_iter=f, training_iter_warm=WARM, fit_schedule=sch)
        uni[_tag(f, sch)] = {
            "goal_dist": round(float(np.asarray(goal_distance(ro))), 4),
            "min_clearance": round(float(jnp.min(jnp.asarray(
                min_obstacle_clearance(sim, ro)))), 4),
            "feasible": round(float(ro.info.feasible.mean()), 4),
        }
    out["unicycle_learning"] = uni

    # --- 2. pendulum online episode (rel-deg-2 stack) per schedule ---
    pend = {}
    for f, sch in CONFIGS:
        psim = make_pendulum_online_sim(max_train=200, training_iter=f,
                                        training_iter_warm=WARM,
                                        fit_schedule=sch)
        X, U, Xdot, info = run_pendulum_online_learning(psim)
        pend[_tag(f, sch)] = {
            "damage": round(float(pendulum_damage_fraction(X[:, 0])), 4),
            "wedge_frac": round(float(pendulum_wedge_fraction(X[:, 0])), 4),
            "theta_end": round(float(X[-1, 0]), 3),
            "finite": bool(np.all(np.isfinite(np.asarray(X)))),
        }
    out["pendulum_online"] = pend

    # --- 3+4. batched bench + batched learning outcomes, one process ---
    batch = int(os.environ.get("AB_BATCH", "256"))
    num_steps = 2000
    dtype = jnp.float32
    x0 = jnp.asarray(STATE_START, dtype)
    goal = np.asarray(STATE_GOAL, np.float64)
    x0s = x0[None, :] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (batch, 3), dtype)
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    bench = {}
    for f, sch in CONFIGS:
        sim = make_ackermann_tracking_sim(
            dt=0.001, numSteps=num_steps, true_L=1.0, mean_L=12.0,
            kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01,
            enable_learning=True, train_every_n_steps=400,
            max_train=200, training_iter=f, socp_iters=25,
            warm_start=True, socp_iters_warm=15, training_iter_warm=WARM,
            fit_schedule=sch)
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
        bench[_tag(f, sch)] = {
            "wall_s": round(wall, 4),
            "steps_per_sec": round(batch * num_steps / wall, 1),
            "finite": bool(np.all(np.isfinite(X))),
            "batched_mean_goal": round(float(gd.mean()), 4),
            "batched_frac_goal_lt_1": round(float((gd < 1.0).mean()), 4),
            "batched_min_clearance": round(clear, 4),
        }
    out["bench_flagship_batch%d" % batch] = bench

    # --- verdicts: every config must preserve the qualitative outcomes
    # on the single-episode, pendulum, AND batched paths ---
    ok = {}
    for f, sch in CONFIGS:
        t = _tag(f, sch)
        ok[t] = bool(
            uni[t]["goal_dist"] < 1.5 and uni[t]["min_clearance"] > 0
            and pend[t]["damage"] == 0.0 and pend[t]["wedge_frac"] <= 0.02
            and pend[t]["finite"] and 1.2 < pend[t]["theta_end"] < 1.9
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
