#!/usr/bin/env python
"""On-chip evidence refresh for parity rows without a recorded run:
car learn-dynamics + ground-truth CBC2 control (rows 27/36), racecar
env episode + CarWorld render (rows 28/29), sharded Monte-Carlo safety
stats (row 46 / BASELINE cfg 5), and a refreshed trigger-tau on the
current stack.  Appends to records/tpu_round2.jsonl; figures to
records/figures/."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "records", "tpu_round2.jsonl")
FIGS = os.path.join(ROOT, "records", "figures")
os.makedirs(FIGS, exist_ok=True)


def record(item, payload):
    with open(OUT, "a") as f:
        f.write(json.dumps({"item": item, **payload}) + "\n")
    print(json.dumps({"item": item, **payload}), flush=True)


def car():
    from bayesian_cbf_tpu.experiments.car import (
        car_learn_dynamics, run_car_control_ground_truth)
    t0 = time.time()
    res = car_learn_dynamics(max_train=100, training_iter=40)
    err = res[-1] if isinstance(res, (tuple, list)) else res
    t1 = time.time()
    from bayesian_cbf_tpu.experiments.car import min_car_clearance
    cbcs, X, U, pres = run_car_control_ground_truth(numSteps=300)
    cl = min_car_clearance(cbcs, X)
    ok = bool(jnp.all(jnp.isfinite(X)))
    record("car_experiments", {
        "learn_dynamics_wall_s": round(t1 - t0, 1),
        "learn_xdot_rmse": round(float(err), 4),
        "control_min_clearance": round(float(jnp.min(jnp.asarray(cl))), 4),
        "control_finite": ok,
        "wall_s": round(time.time() - t0, 1)})


def racecar():
    from bayesian_cbf_tpu.models.racecar import RacecarDynamics
    dyn = RacecarDynamics()
    t0 = time.time()
    s0 = dyn.init_state(jnp.zeros(3), dtype=jnp.float32)
    acts = jnp.stack([jnp.full((200,), 0.6),
                      0.3 * jnp.sin(jnp.arange(200) * 0.05)], axis=1)

    def step(st, a):
        st2, _ = dyn.step(st, a, 0.02)
        return st2, st2.pose

    _, Xs = jax.jit(lambda s, a: jax.lax.scan(step, s, a))(s0, acts)
    X = np.asarray(Xs)
    record("racecar_episode", {
        "steps": 200, "finite": bool(np.isfinite(X).all()),
        "path_len": round(float(np.sum(np.linalg.norm(
            np.diff(X[:, :2], axis=0), axis=1))), 3),
        "wall_s": round(time.time() - t0, 1)})

    from bayesian_cbf_tpu.observability.carworld import CarWorld
    w = CarWorld()
    w.addObstacle(1.0, 0.5, 0.2)
    w.setGoal(2.0, 1.0)
    for x, y, th in X[::20]:
        w.setCarPose(float(x), float(y), float(th))
    fig = os.path.join(FIGS, "racecar_carworld.png")
    w.show(savefile=fig)
    w.close()
    print("carworld figure:", fig, flush=True)


def montecarlo():
    from bayesian_cbf_tpu.experiments.montecarlo import monte_carlo_unicycle
    t0 = time.time()
    sim, outs, stats = monte_carlo_unicycle(n_rollouts=256, numSteps=800)
    payload = {k: round(float(v), 4) for k, v in stats.items()}
    payload["n_rollouts"] = 256
    payload["wall_s"] = round(time.time() - t0, 1)
    record("montecarlo_sharded_stats", payload)


def tau():
    from bayesian_cbf_tpu.experiments.montecarlo import (
        trigger_analysis_learning_run)
    t0 = time.time()
    sim, outs, stats = trigger_analysis_learning_run(stride=10)
    record("trigger_tau_current_stack", {
        "tau_min": float(stats["tau_min"]),
        "tau_median": float(stats["tau_median"]),
        "tau_max": float(stats["tau_max"]),
        "Lfh_median": float(stats["Lfh_median"]),
        "wall_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    which = sys.argv[1:] or ["car", "racecar", "montecarlo", "tau"]
    fns = {"car": car, "racecar": racecar, "montecarlo": montecarlo,
           "tau": tau}
    for w in which:
        try:
            fns[w]()
        except Exception as e:
            import traceback
            traceback.print_exc()
            print("[fail]", w, str(e)[:200], flush=True)
