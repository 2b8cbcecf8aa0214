#!/usr/bin/env python
"""Post-unrolled-KKT phase ablation on the chip (updates phase_breakdown):
full / cold / no-refit / prior-moments, plus an IPM-iteration sweep to
size the remaining solver floor."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "records", "tpu_round2.jsonl")


def main():
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    from bayesian_cbf_tpu.sim.rollout import _simulate_unicycle_batch
    batch, steps = 256, 800
    base = dict(dt=0.001, numSteps=steps, true_L=1.0, mean_L=12.0,
                kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01,
                enable_learning=True, train_every_n_steps=400,
                max_train=200, training_iter=100, socp_iters=25,
                warm_start=True, socp_iters_warm=15)
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
        dt = (time.perf_counter() - t0) / reps
        feas = float(out.info.feasible.mean())
        return dt, feas

    res = {}
    t, f = measure()
    res["full_warm15"] = round(t, 4)
    res["feasible_full"] = round(f, 4)
    res["cold25"] = round(measure(warm_start=False)[0], 4)
    res["no_refit"] = round(measure(train_every_n_steps=10 ** 6)[0], 4)
    res["no_learning_prior_moments"] = round(
        measure(enable_learning=False)[0], 4)
    t10, f10 = measure(socp_iters_warm=10)
    res["warm10"] = round(t10, 4)
    res["feasible_warm10"] = round(f10, 4)
    res["steps_per_sec_full"] = round(batch * steps / res["full_warm15"], 1)
    rec = {"item": "phase_breakdown_unrolled_kkt", **res}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
