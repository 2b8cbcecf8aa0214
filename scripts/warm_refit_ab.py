#!/usr/bin/env python
"""On-chip A/B for `training_iter_warm` (warm-started reduced-budget
refits).

Hyperparameters already persist across scheduled refits — the reference
fits the SAME torch module every time
(bayes_cbf/unicycle_move_to_pose.py:312-316, 349) but still spends the
full training_iter=100 Adam budget per fit.  This study measures what a
reduced budget on the warm (non-first) fits does to

  1. qualitative outcomes (goal reach / clearance / pendulum damage),
  2. the final fitted hyperparameters (rel delta vs the full budget), and
  3. the flagship batched-loop wall (steps/s, in ONE process — the
     cross-process timing noise on the tunneled chip is up to 10x).

Prints one JSON blob; the reviewed result goes to
records/tpu_round3.jsonl as `warm_refit_iters_ab`.
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


WARMS = tuple(int(w) for w in
              os.environ.get("AB_WARMS", "0,25,10").split(","))


def rel_delta(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b) / (np.abs(b) + 1e-12)))


def _wait_for_backend(attempts=10, sleep_s=60):
    """The tunneled TPU backend intermittently fails to initialize
    (UNAVAILABLE); retry a few times before giving up so a long A/B queue
    isn't killed by a transient outage."""
    for i in range(attempts):
        try:
            return jax.devices()
        except RuntimeError as e:
            print(json.dumps({"backend_retry": i, "err": str(e)[:120]}),
                  file=sys.stderr, flush=True)
            time.sleep(sleep_s)
    return jax.devices()  # final attempt raises for real


def main():
    _wait_for_backend()
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START,
        unicycle_learning_helps_avoid_getting_stuck,
        min_obstacle_clearance, goal_distance)
    from bayesian_cbf_tpu.experiments.pendulum import (
        make_pendulum_online_sim, run_pendulum_online_learning,
        pendulum_damage_fraction, pendulum_wedge_fraction)
    from bayesian_cbf_tpu.sim.rollout import _simulate_unicycle_batch

    out = {"warms": list(WARMS)}
    t_start = time.time()

    # --- 1. flagship learning outcome + final hyperparameters per warm ---
    uni = {}
    knl_final = {}
    for w in WARMS:
        sim, ro = unicycle_learning_helps_avoid_getting_stuck(
            training_iter_warm=w)
        uni[w] = {
            "goal_dist": round(float(np.asarray(goal_distance(ro))), 4),
            "min_clearance": round(float(jnp.min(jnp.asarray(
                min_obstacle_clearance(sim, ro)))), 4),
            "feasible": round(float(ro.info.feasible.mean()), 4),
        }
        knl_final[w] = {
            "lengthscale": np.asarray(ro.knl.lengthscale[-1]),
            "outputscale": np.asarray(ro.knl.outputscale[-1]),
            "A": np.asarray(ro.knl.A[-1]),
            "B": np.asarray(ro.knl.B[-1]),
        }
    base = WARMS[0]
    for w in WARMS[1:]:
        uni[w]["final_hyp_rel_delta_vs_full"] = {
            k: round(rel_delta(knl_final[w][k], knl_final[base][k]), 4)
            for k in knl_final[w]}
    out["unicycle_learning"] = {str(k): v for k, v in uni.items()}

    # --- 2. pendulum flagship online-learning outcome per warm ---
    pend = {}
    for w in WARMS:
        sim = make_pendulum_online_sim(max_train=200, training_iter_warm=w)
        X, U, Xdot, info = run_pendulum_online_learning(sim)
        X = np.asarray(X)
        pend[w] = {
            "damage": round(float(pendulum_damage_fraction(X[:, 0])), 4),
            "wedge_frac": round(float(pendulum_wedge_fraction(X[:, 0])), 4),
            "theta_end": round(float(X[-1, 0]), 4),
            "feasible": round(float(np.mean(np.asarray(info["feasible"]))),
                              4),
            "finite": bool(np.all(np.isfinite(X))),
        }
    out["pendulum_online"] = {str(k): v for k, v in pend.items()}

    # --- 3. flagship batched bench per warm, one process ---
    batch = int(os.environ.get("AB_BATCH", "256"))
    num_steps = 2000
    dtype = jnp.float32
    x0 = jnp.asarray(STATE_START, dtype)
    x0s = x0[None, :] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (batch, 3), dtype)
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    bench = {}
    for w in WARMS:
        sim = make_ackermann_tracking_sim(
            dt=0.001, numSteps=num_steps, true_L=1.0, mean_L=12.0,
            kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01,
            enable_learning=True, train_every_n_steps=400,
            max_train=200, training_iter=100, socp_iters=25,
            warm_start=True, socp_iters_warm=15, training_iter_warm=w)
        run = jax.jit(lambda a, k, s=sim: _simulate_unicycle_batch(s, a, k))
        o = run(x0s, keys)
        float(jnp.sum(o.X))  # fence (block_until_ready is unreliable here)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = run(x0s, keys)
            float(jnp.sum(o.X))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        bench[w] = {
            "wall_s": round(wall, 4),
            "steps_per_sec": round(batch * num_steps / wall, 1),
            "finite": bool(jnp.all(jnp.isfinite(o.X))),
        }
    out["bench_flagship_batch%d" % batch] = {
        str(k): v for k, v in bench.items()}

    # --- verdicts: warm budgets must preserve every qualitative outcome ---
    import math
    ok = {}
    for w in WARMS:
        ok[str(w)] = bool(
            uni[w]["goal_dist"] < 1.5 and uni[w]["min_clearance"] > 0
            and pend[w]["damage"] == 0.0 and pend[w]["wedge_frac"] <= 0.02
            and pend[w]["finite"]
            and (math.pi / 4 + math.pi / 8 - 0.02
                 < pend[w]["theta_end"] < 1.9)
            and bench[w]["finite"])
    out["verdicts"] = ok
    out["all_pass"] = all(ok.values())
    out["wall_s_total"] = round(time.time() - t_start, 1)
    print(json.dumps(out))
    return 0 if out["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
