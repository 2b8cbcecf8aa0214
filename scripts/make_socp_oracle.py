#!/usr/bin/env python
"""Generate the stored independent-oracle fixture for the controller's
EXACT cone structures (round-3 verdict 10).

Captures concrete (c, G, h, dims) SOCP data from `bayes_clf_control`
along a real learning episode (CPU f64, eager, solve_socp monkeypatched
to record), solves each problem with scipy SLSQP — an INDEPENDENT
code path (SQP, not a conic IPM) — and commits the solutions plus the
raw cone data to tests/data/socp_oracle.npz.  The paired test
(tests/test_socp.py::test_controller_cones_match_stored_oracle) then
asserts our IPM reproduces the stored optima and independently verifies
an optimality certificate on the raw data in numpy.

The reference's optimum is defined by GUROBI/cvxopt
(bayes_cbf/optimizers.py:91-102, tests/test_optimizers.py:6-119);
neither ships in this environment, so SLSQP-f64 + a numpy KKT
certificate is the strongest available independent anchor (the cvxopt
documentation example with its published optimum is a separate test).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize


def main():
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    from bayesian_cbf_tpu.sim.rollout import simulate_unicycle_with_state
    from bayesian_cbf_tpu.control import bayes_controller as bc

    sim = make_ackermann_tracking_sim(
        numSteps=120, dt=0.01, max_train=32, training_iter=20,
        train_every_n_steps=40, max_risk=0.01)
    out, carry = simulate_unicycle_with_state(sim, STATE_START)
    st = carry[1]

    captured = []
    orig = bc.solve_socp

    def recorder(c, G, h, dims, iters=30, tol=1e-10, warm=None):
        captured.append((np.asarray(c, np.float64),
                         np.asarray(G, np.float64),
                         np.asarray(h, np.float64), tuple(dims)))
        return orig(c, G, h, dims, iters=iters, tol=tol, warm=warm)

    bc.solve_socp = recorder
    try:
        mom_fn = lambda x: sim.learned_dynamics.moments(st, x)
        for t in range(0, 120, 10):
            x = out.X[t].astype(jnp.float64)
            bc.bayes_clf_control(sim.controller, sim.clf, sim.cbfs,
                                 sim.planner, mom_fn, x, jnp.asarray(t))
    finally:
        bc.solve_socp = orig

    dims0 = captured[0][3]
    assert all(d == dims0 for *_, d in captured)
    nprob = len(captured)
    print("captured %d problems, dims=%s" % (nprob, (dims0,)))

    def cones(G, h, dims):
        o = 0
        for d in dims:
            yield G[o:o + d], h[o:o + d]
            o += d

    xs, costs = [], []
    for (c, G, h, dims) in captured:
        cons = []
        for Gk, hk in cones(G, h, dims):
            cons.append({"type": "ineq",
                         "fun": (lambda x, Gk=Gk, hk=hk:
                                 (hk[0] - Gk[0] @ x)
                                 - np.linalg.norm(hk[1:] - Gk[1:] @ x
                                                  + 1e-12))})
        best = None
        for trial in range(4):
            x0 = np.zeros(c.shape[0]) if trial == 0 else \
                0.5 * np.random.default_rng(trial).normal(size=c.shape[0])
            r = minimize(lambda x: c @ x, x0, constraints=cons,
                         method="SLSQP",
                         options={"maxiter": 400, "ftol": 1e-14})
            if r.success and (best is None or r.fun < best.fun):
                best = r
        assert best is not None, "SLSQP failed on a captured cone problem"
        xs.append(best.x)
        costs.append(best.fun)
        print("cost %.6f  x %s" % (best.fun, np.round(best.x, 4)))

    outpath = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "socp_oracle.npz")
    np.savez(outpath,
             c=np.stack([p[0] for p in captured]),
             G=np.stack([p[1] for p in captured]),
             h=np.stack([p[2] for p in captured]),
             dims=np.asarray(dims0, np.int64),
             x_expected=np.stack(xs),
             cost_expected=np.asarray(costs))
    print("wrote", outpath)


if __name__ == "__main__":
    main()
