#!/usr/bin/env python
"""On-chip A/B for the TWO-STAGE first fit on the PENDULUM flagship.

The unicycle adoption record (`first_fit_twostage_ab`) measured
511.7k -> 663.8k steps/s at stride=3 with outcomes unchanged.  This
script runs the same adoption protocol on the rel-deg-2 bench headline
(continuous rank-1 posterior updates + sparse warm refits, B=256,
max_train=200, te=100, warm=5 — bench.py `pendulum` section): the
cold-start fit keeps its full Adam budget on the K/stride subsample,
then warm-refines at full K.

Rows: stride in {0 (control), 2, 3} at refine=15, plus stride=3 at
refine=5 (the CU config's own warm budget — continuous updates keep the
posterior fresh, so the refine stage only has to land hyperparams in
the same basin the warm refits are proven to handle).

Per row: batched-256 wall (ONE process, host-fetch fenced, best-of-3)
and the full `pendulum_batched_cu_safe` outcome set (damage/wedge/
parked/feasible/certified).  Prints one JSON blob; the reviewed result
goes to records/tpu_round5.jsonl as `pendulum_first_fit_twostage_ab`.
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

ROWS = [(0, 15), (2, 15), (3, 15), (3, 5)]
BATCH = int(os.environ.get("AB_BATCH", "256"))


def _wait_for_backend(attempts=10, sleep_s=60):
    for i in range(attempts):
        try:
            return jax.devices()
        except RuntimeError as e:
            print(json.dumps({"backend_retry": i, "err": str(e)[:120]}),
                  file=sys.stderr, flush=True)
            time.sleep(sleep_s)
    return jax.devices()


def main():
    _wait_for_backend()
    from bayesian_cbf_tpu.experiments.pendulum import (
        make_pendulum_online_sim, run_pendulum_online_batch,
        pendulum_damage_fraction, pendulum_wedge_fraction)

    dtype = jnp.float32
    th0 = jnp.asarray([7 * math.pi / 12, 0.0], dtype)
    px0s = th0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), (BATCH, 2), dtype)
    wedge_edge = math.pi / 4 + math.pi / 8

    out = {"rows": [list(r) for r in ROWS], "batch": BATCH}
    res = {}
    t_start = time.time()
    for stride, refine in ROWS:
        psim = make_pendulum_online_sim(
            max_train=200, continuous_updates=True,
            train_every_n_steps=100, training_iter_warm=5,
            first_fit_coarse_stride=stride, first_fit_refine_iter=refine)
        t0 = time.perf_counter()
        pout = run_pendulum_online_batch(psim, px0s)
        float(jnp.sum(pout[0]))  # fence (block_until_ready unreliable here)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            pout = run_pendulum_online_batch(psim, px0s)
            float(jnp.sum(pout[0]))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        pX = np.asarray(pout[0], np.float64)
        dmg = np.array([pendulum_damage_fraction(pX[b, :, 0])
                        for b in range(BATCH)])
        wdg = np.array([pendulum_wedge_fraction(pX[b, :, 0])
                        for b in range(BATCH)])
        res[(stride, refine)] = {
            "wall_s": round(wall, 4),
            "steps_per_sec": round(BATCH * psim.numSteps / wall, 1),
            "compile_plus_first_s": round(compile_s, 1),
            "finite": bool(np.all(np.isfinite(pX))),
            "mean_damage": round(float(dmg.mean()), 4),
            "frac_damaged": round(float((dmg > 0).mean()), 4),
            "frac_wedge_gt_2pct": round(float((wdg > 0.02).mean()), 4),
            "feasible": round(
                float(np.mean(np.asarray(pout[3]["feasible"]))), 4),
            "certified": round(
                float(np.mean(np.asarray(pout[3]["certified"]))), 4),
            "theta_end_range": [round(float(pX[:, -1, 0].min()), 3),
                                round(float(pX[:, -1, 0].max()), 3)],
        }
        print(json.dumps({"row": [stride, refine],
                          **res[(stride, refine)]}),
              file=sys.stderr, flush=True)

    ok = {}
    for key, r in res.items():
        ok["%d_%d" % key] = bool(
            r["finite"] and r["mean_damage"] <= 0.01
            and r["frac_damaged"] <= 0.05
            and r["frac_wedge_gt_2pct"] <= 0.05
            and r["feasible"] >= 0.95
            and r["theta_end_range"][0] > wedge_edge)
    out["results"] = {"%d_%d" % k: v for k, v in res.items()}
    out["verdicts"] = ok
    out["all_pass"] = all(ok.values())
    out["wall_s_total"] = round(time.time() - t_start, 1)
    print(json.dumps(out))
    return 0 if out["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
