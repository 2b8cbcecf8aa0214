#!/usr/bin/env python
"""Round-3 on-chip evidence runs -> records/tpu_round3.jsonl.

Items (run sequentially in one process; the chip is exclusive):
  * ipm_plain_vs_kernel_kkt — directive 2's record: the precision-pinned
    plain path vs the Pallas kernel on 256 random mixed-cone f32
    problems.
  * serving_latency_r3 — directive 5: per-tick latency of the deployed
    controller with and without per-tick rank-1 posterior appends
    (continuous_updates), crossing a scheduled refit.
  * flagship_monte_carlo_1024 — directive 6: 1024 episodes at the TRUE
    flagship config (k=200, 2000 steps, dt=0.001) through parallel/mesh,
    with on-device safety stats.
  * compile_times — directive 8: cold-compile walls for the flagship
    unicycle batch program and the single-scan pendulum episode
    (persistent cache bypassed for the measurement).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "records", "tpu_round3.jsonl")


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def ipm_kkt():
    from bayesian_cbf_tpu.solvers.socp import _score_padded, \
        _solve_padded_plain
    from bayesian_cbf_tpu.ops.pallas_ipm import batched_ipm
    from test_pallas_ipm import _random_batch
    cB, GB, hB, sx, sSZ = _random_batch(0, B=256)
    score = jax.jit(jax.vmap(_score_padded))

    def summarize(out):
        s = np.asarray(score(cB, GB, hB, *out))
        return {"median": float(np.median(s)),
                "p90": float(np.percentile(s, 90)),
                "max": float(s.max())}

    plain = jax.jit(jax.vmap(lambda *a: _solve_padded_plain(*a, 25, 1e-10)))
    rec = {"item": "ipm_plain_vs_kernel_kkt", "B": 256, "iters": 25,
           "plain_pinned": summarize(plain(cB, GB, hB, sx, sSZ, sSZ)),
           "kernel": summarize(batched_ipm(cB, GB, hB, sx, sSZ, sSZ,
                                           iters=25, tol=1e-10)),
           "note": "plain path einsums pinned to HIGHEST precision this "
                   "round; pre-fix plain median was 1.03e-2 on this batch "
                   "(bf16 MXU lowering)"}
    emit(rec)


def serving_latency():
    from bayesian_cbf_tpu.deploy import CompiledController
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    sim = make_ackermann_tracking_sim(
        dt=0.001, numSteps=2000, max_train=200, training_iter=100,
        train_every_n_steps=400, socp_iters=25, warm_start=False)

    def run(cu):
        t0 = time.time()
        ctl = CompiledController(sim, STATE_START, continuous_updates=cu)
        compile_s = time.time() - t0
        lat = []
        for t in range(450):
            s = time.perf_counter()
            u, info = ctl.tick()
            lat.append(time.perf_counter() - s)
        lat_ms = np.asarray(lat) * 1e3
        steady = np.concatenate([lat_ms[1:400], lat_ms[401:]])
        return {
            "median_ms": round(float(np.median(steady)), 3),
            "p99_ms": round(float(np.percentile(steady, 99)), 3),
            "refit_tick_ms": round(float(lat_ms[400]), 3),
            "compile_s": round(compile_s, 1),
            "finite": bool(np.isfinite(u).all()),
        }

    emit({"item": "serving_latency_r3",
          "plain": run(False), "continuous_updates": run(True),
          "note": "continuous_updates: per-tick O(K^2) rank-1 cache "
                  "append (reference must full-refit to incorporate "
                  "data); tick parity test in tests/test_deploy.py"})


def flagship_mc(n=1024):
    from bayesian_cbf_tpu.experiments.montecarlo import monte_carlo_unicycle
    from bayesian_cbf_tpu.ops import cholinv, pallas_chol
    warm = int(os.environ.get("MC_TRAINING_ITER_WARM", "10"))
    t0 = time.time()
    sim, outs, stats = monte_carlo_unicycle(
        n_rollouts=n, numSteps=2000, dt=0.001, max_train=200,
        training_iter=100, training_iter_warm=warm,
        train_every_n_steps=400, socp_iters=25,
        warm_start=True, socp_iters_warm=15,
        true_L=1.0, mean_L=12.0, kernel_diag_A=(1.0, 1.0, 1.0),
        max_risk=0.01)
    wall = time.time() - t0
    t0 = time.time()
    X = np.asarray(outs.X)          # host fetch fences
    run_wall = wall
    feas = float(np.mean(np.asarray(outs.info.feasible)))
    emit({"item": "flagship_monte_carlo_%d" % n,
          "fit_inverse": cholinv.FIT_INVERSE, "nb_blk": pallas_chol.NB_BLK,
          "training_iter_warm": warm,
          "episodes": n, "steps": 2000, "dt": 0.001, "max_train": 200,
          "collision_fraction": float(stats["collision_fraction"]),
          "mean_goal_distance": float(stats["mean_goal_distance"]),
          "min_clearance": float(stats["min_clearance"]),
          "feasible_frac": round(feas, 4),
          "finite": bool(np.all(np.isfinite(X))),
          "wall_s_incl_compile": round(run_wall, 1),
          "steps_per_sec_incl_compile": round(n * 2000 / run_wall, 1)})


def compile_times():
    # bypass the persistent cache so these are honest cold numbers
    jax.config.update("jax_compilation_cache_dir", None)
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    from bayesian_cbf_tpu.sim.rollout import (_simulate_unicycle_batch,
                                              _simulate_unicycle)
    sim = make_ackermann_tracking_sim(
        dt=0.001, numSteps=2000, max_train=200, training_iter=100,
        train_every_n_steps=400, socp_iters=25, warm_start=True,
        socp_iters_warm=15)
    x0 = jnp.asarray(STATE_START, jnp.float32)
    x0s = x0[None] + 0.01 * jax.random.normal(jax.random.PRNGKey(0),
                                              (64, 3), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), 64)
    t0 = time.time()
    jax.jit(lambda a, k: _simulate_unicycle_batch(sim, a, k)) \
        .lower(x0s, keys).compile()
    uni_batch = time.time() - t0
    t0 = time.time()
    jax.jit(lambda a, k: _simulate_unicycle(sim, a, k)[0]) \
        .lower(x0, jax.random.PRNGKey(0)).compile()
    uni_single = time.time() - t0

    from bayesian_cbf_tpu.experiments.pendulum import (
        make_pendulum_online_sim)
    from bayesian_cbf_tpu.sim.rollout import scan_with_scheduled_fits
    psim = make_pendulum_online_sim(max_train=200)
    pd = psim.learned.init_state(jax.random.PRNGKey(0), dtype=jnp.float32)

    def prun(x0, dyn_state, ks):
        _, ys = scan_with_scheduled_fits(
            psim.step_no_fit, psim.learned.fit_now, (x0, dyn_state, ks),
            psim.numSteps, psim.learned.train_every_n_steps,
            psim.learned.enable_learning)
        return ys

    t0 = time.time()
    jax.jit(prun).lower(jnp.zeros(2, jnp.float32), pd,
                        jax.random.PRNGKey(1)).compile()
    pend_single = time.time() - t0
    emit({"item": "compile_times_cold",
          "unicycle_batch64_2000steps_s": round(uni_batch, 1),
          "unicycle_single_2000steps_s": round(uni_single, 1),
          "pendulum_online_single_scan_s": round(pend_single, 1),
          "note": "persistent cache bypassed; pendulum program is the "
                  "round-3 single-scan cond-refit structure (the round-2 "
                  "25-segment program did not finish compiling in 590 s "
                  "on this host)"})


def main():
    which = sys.argv[1:] or ["ipm", "serving", "mc", "compile"]
    if "ipm" in which:
        ipm_kkt()
    if "serving" in which:
        serving_latency()
    if "mc" in which:
        flagship_mc()
    if "compile" in which:
        compile_times()


if __name__ == "__main__":
    main()
