#!/usr/bin/env python
"""Run the four README experiments at full scale (2000 steps, dt=0.001)
and report the qualitative safety outcomes that are the paper's headline
(BASELINE.md: mean-CBF collides; Bayes-CBF safe; no-learning stuck;
learning passes).

Usage:  python scripts/run_readme_experiments.py [--steps 2000] [--plot]
Writes outcomes JSON to data/readme_experiments.json (+ PNGs with --plot).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
if "--cpu" in sys.argv:
    # env vars are too late on this host (sitecustomize pre-imports jax)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--dt", type=float, default=0.001)
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_enable_x64", True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bayesian_cbf_tpu.experiments.unicycle import (
        unicycle_mean_cbf_collides_obstacle,
        unicycle_bayes_cbf_safe_obstacle,
        unicycle_learning_helps_avoid_getting_stuck,
        unicycle_no_learning_gets_stuck,
        min_obstacle_clearance, goal_distance, STATE_GOAL)

    runs = {
        "mean_cbf_collides": unicycle_mean_cbf_collides_obstacle,
        "bayes_cbf_safe": unicycle_bayes_cbf_safe_obstacle,
        "learning_helps": unicycle_learning_helps_avoid_getting_stuck,
        "no_learning_stuck": unicycle_no_learning_gets_stuck,
    }
    results = {}
    for name, fn in runs.items():
        t0 = time.time()
        sim, out = fn(numSteps=args.steps, dt=args.dt)
        jax.block_until_ready(out.X)
        clear = min_obstacle_clearance(sim, out)
        gd = goal_distance(out)
        results[name] = {
            "min_clearance": [float(c) for c in clear],
            "collided": bool(jnp.min(clear) < 0.0),
            "final_goal_distance": float(gd),
            "reached_goal": bool(gd < 0.8),
            "feasible_frac": float(out.info.feasible.mean()),
            "finite": bool(jnp.all(jnp.isfinite(out.X))),
            "wall_s": round(time.time() - t0, 1),
        }
        print(name, json.dumps(results[name]), flush=True)
        if args.plot:
            from bayesian_cbf_tpu.observability.plotting import \
                plot_unicycle_run
            os.makedirs("data", exist_ok=True)
            plot_unicycle_run(out, cbfs=sim.cbfs,
                              x_goal=jnp.asarray(STATE_GOAL),
                              title=name,
                              savefile=f"data/{name}.png")

    # headline expectations (README.md:42-74 of the reference)
    verdict = {
        "mean_cbf_more_dangerous_than_bayes": (
            min(results["mean_cbf_collides"]["min_clearance"])
            < min(results["bayes_cbf_safe"]["min_clearance"])),
        "bayes_cbf_safe": not results["bayes_cbf_safe"]["collided"],
        "learning_reaches_goal_better": (
            results["learning_helps"]["final_goal_distance"]
            < results["no_learning_stuck"]["final_goal_distance"]),
    }
    os.makedirs("data", exist_ok=True)
    with open("data/readme_experiments.json", "w") as f:
        json.dump({"results": results, "verdict": verdict}, f, indent=1)
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
