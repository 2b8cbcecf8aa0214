#!/usr/bin/env python
"""Split the rollout-scan phase (the round-5 perf target) on chip.

The round-4 profile decomposition (records
`bench_device_profile_decomposition_r4`) showed the rollout scan's
per-step XLA fusions (0.276 s of the 0.97 s flagship window) dominate
the non-refit wall, with the IPM kernel only 17% of the scan.  This
A/B splits that fusion chain by COMPONENT, same process, same keys
(cross-process noise is up to 10x on this tunnel — in-process only):

  prior      — enable_learning=False flagship config (2 obstacle CBC
               cones + CLF cone + objective cone per step): the bench's
               `rollout_cones_socp` phase.
  no_cbc     — same with cbfs=(): drops the two CBC cone
               constructions AND shrinks the SOCP; the delta is the
               all-in cost of the obstacle-cone machinery.
  cold_socp  — prior with warm_start=False (cold 25-iter IPM vs warm
               15): isolates IPM iteration-count sensitivity.

Appends one JSON line to records/tpu_round4.jsonl.
Env: SPLIT_BATCH / SPLIT_STEPS (default 256 / 2000).
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

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "records", "tpu_round4.jsonl")


def main():
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    from bayesian_cbf_tpu.sim.rollout import _simulate_unicycle_batch

    batch = int(os.environ.get("SPLIT_BATCH", "256"))
    steps = int(os.environ.get("SPLIT_STEPS", "2000"))
    base = dict(dt=0.001, numSteps=steps, true_L=1.0, mean_L=12.0,
                kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01,
                enable_learning=False, train_every_n_steps=400,
                max_train=200, training_iter=100,
                socp_iters=25, warm_start=True, socp_iters_warm=15)
    x0 = jnp.asarray(STATE_START, jnp.float32)
    x0s = x0[None, :] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (batch, 3), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), batch)

    def measure(sim):
        run = jax.jit(lambda a, k: _simulate_unicycle_batch(sim, a, k))
        o = run(x0s, keys)
        float(jnp.sum(o.X))                       # fence via host fetch
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = run(x0s, keys)
            float(jnp.sum(o.X))
            best = min(best, time.perf_counter() - t0)
        return best, bool(jnp.all(jnp.isfinite(o.X)))

    sim_prior = make_ackermann_tracking_sim(**base)
    sim_nocbc = sim_prior._replace(cbfs=())
    sim_cold = make_ackermann_tracking_sim(
        **{**base, "warm_start": False})

    t_prior, f1 = measure(sim_prior)
    t_nocbc, f2 = measure(sim_nocbc)
    t_cold, f3 = measure(sim_cold)

    rec = {
        "item": "rollout_phase_split",
        "note": ("in-process split of the rollout-scan phase (round-5 "
                 "target): prior = flagship cones+SOCP+dynamics with "
                 "prior moments; no_cbc drops the 2 obstacle CBC cones "
                 "(delta = all-in obstacle-cone machinery incl. smaller "
                 "SOCP); cold_socp = cold 25-iter IPM vs warm 15 "
                 "(delta = IPM iteration-count sensitivity)."),
        "batch": batch, "steps": steps,
        "prior_s": round(t_prior, 4),
        "no_cbc_s": round(t_nocbc, 4),
        "cold_socp_s": round(t_cold, 4),
        "cbc_cone_cost_s": round(t_prior - t_nocbc, 4),
        "warm_vs_cold_delta_s": round(t_cold - t_prior, 4),
        "finite": bool(f1 and f2 and f3),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
