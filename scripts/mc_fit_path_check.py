#!/usr/bin/env python
"""On-chip A/B of the batched FIT inversion kernel at Monte-Carlo scale.

Runs monte_carlo_unicycle at the flagship config for each requested
`cholinv.FIT_INVERSE` variant (env MC_FIT_VARIANTS, default "chol,sweep")
and prints one JSON line per variant with goal/clearance/collision
stats.  Context: records/tpu_round3.jsonl fit_inverse_regression_root_
cause — the sweep recursion is non-finite on real f32 fit Grams, which
killed batched learning (mean goal 0.53 -> 2.81) while the
single-episode gate stayed green.  Expected after the fix: chol ~0.5
mean goal; sweep reproduces the regressed ~2.8.

Run on the TPU (chip is exclusive).  MC_EPISODES (default 256).
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


def main():
    n = int(os.environ.get("MC_EPISODES", "256"))
    variants = os.environ.get("MC_FIT_VARIANTS", "cholk,sweep").split(",")
    from bayesian_cbf_tpu.ops import cholinv
    default = cholinv.FIT_INVERSE
    from bayesian_cbf_tpu.experiments.montecarlo import monte_carlo_unicycle
    from bayesian_cbf_tpu.experiments.unicycle import STATE_GOAL

    for v in variants:
        cholinv.FIT_INVERSE = v
        t0 = time.time()
        sim, outs, stats = monte_carlo_unicycle(
            n_rollouts=n, numSteps=2000, dt=0.001, max_train=200,
            training_iter=100, train_every_n_steps=400, socp_iters=25,
            warm_start=True, socp_iters_warm=15, true_L=1.0, mean_L=12.0,
            kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01)
        X = np.asarray(outs.X)
        gd = np.linalg.norm(
            X[:, -1, :2] - np.asarray(STATE_GOAL)[:2], axis=-1)
        print(json.dumps({
            "item": "mc_fit_path_check", "fit_inverse": v, "episodes": n,
            "mean_goal_distance": round(float(stats["mean_goal_distance"]), 4),
            "median_goal": round(float(np.median(gd)), 4),
            "frac_goal_lt_1": round(float(np.mean(gd < 1.0)), 4),
            "collision_fraction": float(stats["collision_fraction"]),
            "min_clearance": round(float(stats["min_clearance"]), 4),
            "feasible": round(float(np.mean(np.asarray(outs.info.feasible))),
                              4),
            "finite": bool(np.all(np.isfinite(X))),
            "wall_s_incl_compile": round(time.time() - t0, 1),
        }), flush=True)
    cholinv.FIT_INVERSE = default


if __name__ == "__main__":
    main()
