#!/usr/bin/env python
"""Timed record: batched pendulum online-learning throughput + safety
stats at B>=64 on chip (round-3 verdict 7 — the rel-deg-2 stack gets
the same batched evidence the unicycle MC has).

Reference loop (strictly sequential, single episode):
bayes_cbf/pendulum.py:164-252,1041-1048.

One process, host-fetch fenced, best-of-3.  Appends one JSON line to
records/tpu_round4.jsonl.  Env: PB_B (batch, default 64), PB_WARM.
"""
import json
import math
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

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "records", "tpu_round4.jsonl")


def main():
    from bayesian_cbf_tpu.experiments.pendulum import (
        make_pendulum_online_sim, run_pendulum_online_batch,
        pendulum_damage_fraction, pendulum_wedge_fraction)

    B = int(os.environ.get("PB_B", "64"))
    warm = int(os.environ.get("PB_WARM", "0"))
    kw = {"training_iter_warm": warm} if warm else {}
    sim = make_pendulum_online_sim(max_train=200, **kw)

    th0 = jnp.asarray([7 * math.pi / 12, 0.0], jnp.float32)
    x0s = th0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), (B, 2), jnp.float32)

    t0 = time.time()
    X, U, Xdot, info = run_pendulum_online_batch(sim, x0s)
    float(jnp.sum(X))
    compile_and_first = time.time() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        X, U, Xdot, info = run_pendulum_online_batch(sim, x0s)
        float(jnp.sum(X))
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    Xn = np.asarray(X)
    dmg = np.array([pendulum_damage_fraction(Xn[b, :, 0]) for b in range(B)])
    wdg = np.array([pendulum_wedge_fraction(Xn[b, :, 0]) for b in range(B)])
    theta_end = Xn[:, -1, 0]
    rec = {
        "item": "pendulum_batched_throughput",
        "B": B, "numSteps": sim.numSteps, "max_train": 200,
        "training_iter_warm": warm,
        "steps_per_sec": round(B * sim.numSteps / wall, 1),
        "wall_s": round(wall, 4),
        "compile_plus_first_s": round(compile_and_first, 1),
        "mean_damage": round(float(dmg.mean()), 4),
        "frac_damaged": round(float((dmg > 0).mean()), 4),
        "mean_wedge_frac": round(float(wdg.mean()), 4),
        "theta_end_minmax": [round(float(theta_end.min()), 3),
                             round(float(theta_end.max()), 3)],
        "feasible": round(float(np.mean(np.asarray(info["feasible"]))), 4),
        "finite": bool(np.all(np.isfinite(Xn))),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
