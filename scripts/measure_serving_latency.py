#!/usr/bin/env python
"""Single-tick serving latency of the deployed controller on chip
(the reference's per-step wall is 10-100 ms on CPU+GUROBI,
controllers.py:586,659).  Appends a record to records/tpu_round2.jsonl."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bayesian_cbf_tpu.deploy import CompiledController
from bayesian_cbf_tpu.experiments.unicycle import (
    make_ackermann_tracking_sim, STATE_START)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "records", "tpu_round2.jsonl")


def main():
    sim = make_ackermann_tracking_sim(
        dt=0.001, numSteps=2000, max_train=200, training_iter=100,
        train_every_n_steps=400, socp_iters=25, warm_start=False)
    t0 = time.time()
    ctl = CompiledController(sim, STATE_START)
    compile_s = time.time() - t0
    lat = []
    # 450 ticks crosses the first scheduled refit at t=400
    for t in range(450):
        s = time.perf_counter()
        u, info = ctl.tick()
        lat.append(time.perf_counter() - s)
    lat_ms = np.asarray(lat) * 1e3
    steady = np.concatenate([lat_ms[1:400], lat_ms[401:]])
    rec = {
        "item": "serving_latency",
        "platform": jax.devices()[0].platform,
        "median_ms": round(float(np.median(steady)), 3),
        "p99_ms": round(float(np.percentile(steady, 99)), 3),
        "max_ms": round(float(lat_ms.max()), 3),
        "refit_tick_ms": round(float(lat_ms[400]), 3),
        "compile_s": round(compile_s, 1),
        "finite": bool(np.isfinite(u).all()),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
