#!/usr/bin/env python
"""Re-measure the k-scaling end-to-end rows (SURVEY 5.8 'when k grows')
on the FIXED batched fit-inversion path (cholinv.FIT_INVERSE='chol').

The original k_scaling_e2e record (records/tpu_round3.jsonl) was taken
with the recursive sweep fit live, whose values were non-finite on real
fit Grams (records: fit_inverse_regression_root_cause) — its walls are
invalid as learning throughput.  This reruns the same three
configurations through the current default stack and appends a fresh
record.

One process, host-fetch fenced, best-of-3 (CLAUDE.md timing rules).
Optional: K_SCALING_WARM=<n> applies the gated training_iter_warm
budget so the rows match the headline bench configuration.
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

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "records", "tpu_round4.jsonl")


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

    warm = int(os.environ.get("K_SCALING_WARM", "0"))
    num_steps = 2000
    train_every = 400
    # rows as "k:batch" pairs; the k=1024 row exercises the raised
    # kernel cap (cholinv._PALLAS_MAX_N, round-4 directive 5)
    row_spec = os.environ.get("K_SCALING_ROWS",
                              "200:256,384:64,512:64,1024:16")
    rows = []
    for max_train, batch in (tuple(int(v) for v in r.split(":"))
                             for r in row_spec.split(",")):
        sim = make_ackermann_tracking_sim(
            dt=0.001, numSteps=num_steps, true_L=1.0, mean_L=12.0,
            kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01,
            enable_learning=True, train_every_n_steps=train_every,
            max_train=max_train, training_iter=100, socp_iters=25,
            warm_start=True, socp_iters_warm=15, training_iter_warm=warm)
        x0 = jnp.asarray(STATE_START, jnp.float32)
        x0s = x0[None, :] + 0.01 * jax.random.normal(
            jax.random.PRNGKey(0), (batch, 3), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(1), batch)
        run = jax.jit(lambda a, k, s=sim: _simulate_unicycle_batch(s, a, k))
        o = run(x0s, keys)
        float(jnp.sum(o.X))  # fence
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = run(x0s, keys)
            float(jnp.sum(o.X))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        rows.append({
            "max_train": max_train, "batch": batch,
            "steps_per_sec": round(batch * num_steps / wall, 1),
            "wall_s": round(wall, 4),
            "finite": bool(jnp.all(jnp.isfinite(o.X))),
        })
        print(json.dumps(rows[-1]), flush=True)

    rec = {"item": "k_scaling_e2e_fixed_fit",
           "note": "k-scaling rows re-measured on the corrected batched "
                   "fit path (FIT_INVERSE=chol, nb=32%s); supersedes "
                   "k_scaling_e2e whose refit computed non-finite sweep "
                   "inversions" % (
                       ", training_iter_warm=%d" % warm if warm else ""),
           "training_iter_warm": warm,
           "rows": rows,
           "all_finite": all(r["finite"] for r in rows)}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
