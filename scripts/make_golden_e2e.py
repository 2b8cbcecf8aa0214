#!/usr/bin/env python
"""Regenerate tests/data/golden_e2e_unicycle.npz.

The fixture is a REGRESSION pin (same code path that consumes it, f64
CPU): a 40-step learn+solve+step unicycle episode.  Regenerate it ONLY
after an intentional numerics change, and only after
`scripts/check_outcomes.py` passes on chip and the independent oracles
(tests/test_f32_and_golden.py, SOCP/scipy cross-checks) are green —
those gates are what make refreshing this pin safe.

Usage: python scripts/make_golden_e2e.py
"""
import os.path as osp

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main():
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    from bayesian_cbf_tpu.sim.rollout import simulate_unicycle
    # EXACTLY the config of tests/test_unicycle_e2e.py::test_golden_e2e_trajectory
    sim = make_ackermann_tracking_sim(numSteps=40, dt=0.01, max_train=24,
                                      training_iter=10,
                                      train_every_n_steps=15)
    out = simulate_unicycle(sim, np.asarray(STATE_START),
                            key=jax.random.PRNGKey(7))
    path = osp.join(osp.dirname(__file__), "..", "tests", "data",
                    "golden_e2e_unicycle.npz")
    np.savez(path, X=np.asarray(out.X), U=np.asarray(out.U),
             feasible=np.asarray(out.info.feasible))
    print("wrote", osp.normpath(path),
          "X", out.X.shape, "U", out.U.shape,
          "feasible_frac", float(np.mean(np.asarray(out.info.feasible))))


if __name__ == "__main__":
    main()
