#!/usr/bin/env python
"""Round-2 TPU measurement batch.  Runs on the real chip (default axon
platform, float32 fast path) and appends one JSON record per item to
records/tpu_round2.jsonl so partial progress survives the remote-compile
service's intermittent failures.

Items:
  readme_outcomes   four README experiments at flagship scale, warm IPM
  trigger_tau       self-triggered tau over the real learning run
  pendulum_speed    online pendulum loop steps/sec, closed-form vs GP path
  pallas_table      fused-Gram Pallas kernel vs XLA at k in {64,200,512}
  phase_breakdown   flagship bench wall per ablated phase
"""
import json
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "records", "tpu_round2.jsonl")
os.makedirs(os.path.dirname(OUT), exist_ok=True)
DONE = set()
if os.path.exists(OUT):
    with open(OUT) as f:
        for line in f:
            try:
                DONE.add(json.loads(line)["item"])
            except Exception:
                pass


def record(item, payload):
    with open(OUT, "a") as f:
        f.write(json.dumps({"item": item, **payload}) + "\n")
    print(json.dumps({"item": item, **payload}), flush=True)


def guarded(name):
    def deco(fn):
        def run():
            if name in DONE:
                print(f"[skip] {name} already recorded", flush=True)
                return
            try:
                t0 = time.time()
                payload = fn()
                payload["wall_s"] = round(time.time() - t0, 1)
                record(name, payload)
            except Exception as e:
                traceback.print_exc()
                record(name, {"error": str(e)[:500]})
        return run
    return deco


@guarded("readme_outcomes")
def readme_outcomes():
    from bayesian_cbf_tpu.experiments.unicycle import (
        unicycle_mean_cbf_collides_obstacle,
        unicycle_bayes_cbf_safe_obstacle,
        unicycle_learning_helps_avoid_getting_stuck,
        unicycle_no_learning_gets_stuck,
        min_obstacle_clearance, goal_distance)
    kw = dict(warm_start=True)
    res = {}
    for name, fn in [
            ("mean_cbf_collides", unicycle_mean_cbf_collides_obstacle),
            ("bayes_cbf_safe", unicycle_bayes_cbf_safe_obstacle),
            ("learning_helps", unicycle_learning_helps_avoid_getting_stuck),
            ("no_learning_stuck", unicycle_no_learning_gets_stuck)]:
        sim, out = fn(**kw)
        clr = float(np.min(np.asarray(min_obstacle_clearance(sim, out))))
        gd = float(np.asarray(goal_distance(out)))
        res[name] = {"min_clearance": round(clr, 4),
                     "goal_dist": round(gd, 4),
                     "feasible_frac": round(float(np.mean(np.asarray(
                         out.info.feasible))), 4)}
    # verdicts
    res["verdict"] = {
        "collides": res["mean_cbf_collides"]["min_clearance"] < 0,
        "safe": res["bayes_cbf_safe"]["min_clearance"] > 0,
        "learning_passes": (res["learning_helps"]["goal_dist"]
                            < res["no_learning_stuck"]["goal_dist"]),
    }
    return res


@guarded("trigger_tau")
def trigger_tau():
    from bayesian_cbf_tpu.experiments.montecarlo import (
        trigger_analysis_learning_run)
    sim, outs, stats = trigger_analysis_learning_run(
        stride=10, warm_start=True)
    return {k: (round(v, 8) if isinstance(v, float) else None)
            for k, v in stats.items() if isinstance(v, float)}


@guarded("pendulum_speed")
def pendulum_speed():
    from bayesian_cbf_tpu.experiments.pendulum import (
        make_pendulum_online_sim, run_pendulum_online_learning)
    res = {}
    for label, cf in [("closed_form", True), ("gp_path", False)]:
        sim = make_pendulum_online_sim(numSteps=250, max_train=200,
                                       training_iter=100)
        sim = sim._replace(controller=sim.controller._replace(
            closed_form=cf))
        t0 = time.perf_counter()
        X, U, Xdot, info = run_pendulum_online_learning(sim)
        jax.block_until_ready(X)
        compile_and_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            X, U, Xdot, info = run_pendulum_online_learning(sim)
            jax.block_until_ready(X)
        wall = (time.perf_counter() - t0) / reps
        res[label] = {"steps_per_sec": round(250 / wall, 1),
                      "wall_s": round(wall, 4),
                      "compile_s": round(compile_and_run - wall, 1),
                      "finite": bool(np.all(np.isfinite(np.asarray(X))))}
    return res


@guarded("pallas_table")
def pallas_table():
    from bayesian_cbf_tpu.models.mvgp import make_mvgp_rank1
    from bayesian_cbf_tpu.experiments.pendulum import sample_pendulum_data
    X, U, Xdot = sample_pendulum_data(numSteps=2048, seed=0)
    X = jnp.asarray(np.asarray(X), jnp.float32)
    U = jnp.asarray(np.asarray(U), jnp.float32)
    Xdot = jnp.asarray(np.asarray(Xdot), jnp.float32)
    Xtest = X[:441]
    res = {}
    for k in (64, 200, 512):
        row = {}
        for label, use_pallas in [("xla", False), ("pallas", True)]:
            gp = make_mvgp_rank1(2, 1, use_pallas=use_pallas)
            params = gp.init_params(jax.random.PRNGKey(0),
                                    dtype=jnp.float32)
            data = gp.make_data(X[:k], U[:k], Xdot[:k])

            def full(p, d, xt):
                cache = gp.refresh_cache(p, d)
                return gp.predict_fullmat(p, d, cache, xt)

            fn = jax.jit(full)
            mean, var = fn(params, data, Xtest)
            jax.block_until_ready(var)
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(10):
                    mean, var = fn(params, data, Xtest)
                jax.block_until_ready(var)
                times.append((time.perf_counter() - t0) / 10)
            row[label] = round(min(times) * 1000, 3)  # ms
        res[f"k={k}"] = row
    return res


@guarded("phase_breakdown")
def phase_breakdown():
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
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
        reps = 3
        for _ in range(reps):
            out = run(x0s, keys)
            jax.block_until_ready(out.X)
        return (time.perf_counter() - t0) / reps

    res = {}
    res["full_warm10"] = round(measure(), 4)
    res["cold25"] = round(measure(warm_start=False), 4)
    res["no_refit"] = round(measure(train_every_n_steps=10 ** 6), 4)
    res["no_learning_prior_moments"] = round(
        measure(enable_learning=False), 4)
    res["steps_per_sec_full"] = round(batch * steps / res["full_warm10"], 1)
    return res


if __name__ == "__main__":
    which = sys.argv[1:] or ["readme_outcomes", "trigger_tau",
                             "pendulum_speed", "pallas_table",
                             "phase_breakdown"]
    fns = {"readme_outcomes": readme_outcomes, "trigger_tau": trigger_tau,
           "pendulum_speed": pendulum_speed, "pallas_table": pallas_table,
           "phase_breakdown": phase_breakdown}
    print("platform:", jax.devices()[0].platform, flush=True)
    for w in which:
        fns[w]()
