#!/usr/bin/env python
"""On-chip A/B of the bench batch size at the default flagship config
(warm=10, FIT_INVERSE=chol).

Round 2 concluded "single-chip throughput saturates at batch ~256" when
the window was refit-dominated at full budget.  The post-warm balance
is different (refit ~60%, moments cache 41 MB at B=256 vs the 128 MB
VMEM), so re-check 128/256/512 in ONE process (host-fetch fenced,
best-of-3 — CLAUDE.md timing rules).  At B=512 the Linv cache is 82 MB:
if XLA can no longer keep it VMEM-resident the moments phase should
blow up, which this measures directly.
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


def _wait_for_backend(attempts=10, sleep_s=60):
    for _ in range(attempts):
        try:
            return jax.devices()
        except RuntimeError:
            time.sleep(sleep_s)
    return jax.devices()


def main():
    _wait_for_backend()
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    from bayesian_cbf_tpu.sim.rollout import _simulate_unicycle_batch

    batches = [int(b) for b in
               os.environ.get("AB_BATCHES", "128,256,512").split(",")]
    num_steps = 2000
    sim = make_ackermann_tracking_sim(
        dt=0.001, numSteps=num_steps, true_L=1.0, mean_L=12.0,
        kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01,
        enable_learning=True, train_every_n_steps=400,
        max_train=200, training_iter=100, socp_iters=25,
        warm_start=True, socp_iters_warm=15, training_iter_warm=10)
    x0 = jnp.asarray(STATE_START, jnp.float32)
    rows = {}
    for b in batches:
        x0s = x0[None, :] + 0.01 * jax.random.normal(
            jax.random.PRNGKey(0), (b, 3), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(1), b)
        run = jax.jit(lambda a, k: _simulate_unicycle_batch(sim, a, k))
        o = run(x0s, keys)
        float(jnp.sum(o.X))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = run(x0s, keys)
            float(jnp.sum(o.X))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        rows[b] = {"wall_s": round(wall, 4),
                   "steps_per_sec": round(b * num_steps / wall, 1),
                   "finite": bool(jnp.all(jnp.isfinite(o.X)))}
        print(json.dumps({"batch": b, **rows[b]}), flush=True)
    print(json.dumps({"item": "batch_size_ab_warm10",
                      "rows": {str(k): v for k, v in rows.items()}}))


if __name__ == "__main__":
    main()
