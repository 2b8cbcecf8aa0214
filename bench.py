#!/usr/bin/env python
"""Headline benchmark: aggregate control steps/sec of the full unicycle
Bayes-CBF loop (online MVGP posterior + CBC SOCP per step), batched over
Monte-Carlo rollouts on one chip.

Reference baseline: the PyTorch+GUROBI loop runs ~10-100 control steps/sec
on CPU (BASELINE.md, per-step prints controllers.py:586,659).  We take the
generous end, 100 steps/sec, as the vs_baseline denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import math
import os
import sys
import time

import jax
import jax.numpy as jnp


def _wait_for_backend(attempts=10, sleep_s=60):
    """Tunneled-TPU init intermittently fails UNAVAILABLE; retry so a
    transient outage at bench time doesn't lose the round's record."""
    for _ in range(attempts):
        try:
            return jax.devices()
        except RuntimeError:
            time.sleep(sleep_s)
    return jax.devices()


def main():
    # fast path dtype: f32 on accelerators, f64 on CPU fallback
    platform = _wait_for_backend()[0].platform
    if platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    from bayesian_cbf_tpu.sim.rollout import _simulate_unicycle_batch

    # the TRUE flagship config (unicycle_learning_helps_avoid_getting_stuck,
    # BASELINE.md: max_train=200, train_every_n_steps=400, training_iter=100),
    # sized to two refits inside the horizon; 2 obstacle CBC cones + CLC
    # cone + objective cone per step; warm-started IPM across the scan.
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    num_steps = int(os.environ.get("BENCH_STEPS", "2000"))
    max_train = int(os.environ.get("BENCH_MAX_TRAIN", "200"))
    train_every = int(os.environ.get("BENCH_TRAIN_EVERY", "400"))
    training_iter = int(os.environ.get("BENCH_TRAINING_ITER", "100"))
    # Warm-started refits: the first fit spends the full training_iter
    # budget; subsequent scheduled refits resume from the already-fitted
    # hyperparameters with this reduced Adam budget.  Default 10 is
    # outcome-gated on chip (records/tpu_round3.jsonl warm_refit_iters_ab:
    # goal/clearance/pendulum-damage verdicts identical to the full budget
    # at warm in {10, 25}); set BENCH_TRAINING_ITER_WARM=0 for the
    # reference's full-budget-every-refit semantics (129.0k steps/s vs
    # 308.5k, same record).
    training_iter_warm = int(os.environ.get("BENCH_TRAINING_ITER_WARM", "10"))
    # Two-stage first fit (default on, outcome-gated like the warm knob):
    # the cold-start fit keeps its full 100-iteration Adam budget but
    # spends it on the stride-subsampled reservoir (K/2 rows, ~1/8 the
    # Gram FLOPs/iter), then warm-refines at full K — see
    # LearnedShiftInvariantDynamics.first_fit_coarse_stride.  Set
    # BENCH_FIRST_FIT_STRIDE=0 for the single-stage reference semantics.
    ff_stride = int(os.environ.get("BENCH_FIRST_FIT_STRIDE", "4"))
    ff_refine = int(os.environ.get("BENCH_FIRST_FIT_REFINE", "15"))
    warm = os.environ.get("BENCH_WARM", "1") == "1"
    sim = make_ackermann_tracking_sim(
        dt=0.001, numSteps=num_steps, true_L=1.0, mean_L=12.0,
        kernel_diag_A=(1.0, 1.0, 1.0), max_risk=0.01,
        enable_learning=True, train_every_n_steps=train_every,
        max_train=max_train, training_iter=training_iter,
        socp_iters=25, warm_start=warm, socp_iters_warm=15,
        training_iter_warm=training_iter_warm,
        first_fit_coarse_stride=ff_stride, first_fit_refine_iter=ff_refine)

    dtype = jnp.float64 if platform == "cpu" else jnp.float32
    x0 = jnp.asarray(STATE_START, dtype)
    x0s = x0[None, :] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (batch, 3), dtype)
    keys = jax.random.split(jax.random.PRNGKey(1), batch)

    run = jax.jit(lambda a, k: _simulate_unicycle_batch(sim, a, k))
    # warmup/compile
    out = run(x0s, keys)
    jax.block_until_ready(out.X)
    ok = bool(jnp.all(jnp.isfinite(out.X)))

    profile_dir = os.environ.get("BENCH_PROFILE")
    import contextlib
    if profile_dir:
        from bayesian_cbf_tpu.observability.profiling import trace
        prof_ctx = trace(profile_dir)
    else:
        prof_ctx = contextlib.nullcontext()
    t0 = time.perf_counter()
    reps = 3
    with prof_ctx:
        for _ in range(reps):
            out = run(x0s, keys)
            jax.block_until_ready(out.X)
    dt_run = (time.perf_counter() - t0) / reps

    steps_per_sec = batch * num_steps / dt_run
    baseline = 100.0  # reference steps/sec (generous), BASELINE.md
    result = {
        "metric": "unicycle Bayes-CBF control steps/sec "
                  "(online MVGP + CBC SOCP, batch=%d)" % batch,
        "value": round(steps_per_sec, 1),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / baseline, 2),
        "finite": ok,
        "platform": platform,
        "episode_steps": num_steps,
        "max_train": max_train,
        "warm_start": warm,
        "training_iter_warm": training_iter_warm,
        "first_fit_coarse_stride": ff_stride,
        "wall_s_per_batch": round(dt_run, 4),
    }

    # --- versioned roofline (round-3 directive 4): per-phase walls +
    # bandwidth utilization against the MEASURED achievable HBM stream
    # (109 GB/s on this part, records/tpu_round2.jsonl:
    # moments_bandwidth_analysis — NOT the datasheet number).
    if os.environ.get("BENCH_PHASES", "1") == "1" and platform != "cpu":
        def measure_variant(**kw):
            from bayesian_cbf_tpu.experiments.unicycle import (
                make_ackermann_tracking_sim as mk)
            cfg = dict(dt=0.001, numSteps=num_steps, true_L=1.0,
                       mean_L=12.0, kernel_diag_A=(1.0, 1.0, 1.0),
                       max_risk=0.01, enable_learning=True,
                       train_every_n_steps=train_every,
                       max_train=max_train, training_iter=training_iter,
                       socp_iters=25, warm_start=warm, socp_iters_warm=15,
                       training_iter_warm=training_iter_warm,
                       first_fit_coarse_stride=ff_stride,
                       first_fit_refine_iter=ff_refine)
            cfg.update(kw)
            vsim = mk(**cfg)
            vrun = jax.jit(lambda a, k: _simulate_unicycle_batch(vsim, a, k))
            o = vrun(x0s, keys)
            jax.block_until_ready(o.X)
            t0 = time.perf_counter()
            for _ in range(reps):
                o = vrun(x0s, keys)
                jax.block_until_ready(o.X)
            return (time.perf_counter() - t0) / reps

        t_full = dt_run
        t_norefit = measure_variant(train_every_n_steps=10 ** 6)
        t_prior = measure_variant(enable_learning=False)
        t_moments = max(t_norefit - t_prior, 1e-9)
        n_fits = max(num_steps // train_every, 1) if train_every < num_steps \
            else 0
        t_refit = max(t_full - t_norefit, 0.0)
        warm_iters = (training_iter_warm if training_iter_warm > 0
                      else training_iter)
        # full-K Adam iterations; with the two-stage first fit the coarse
        # stage runs training_iter iterations on the K/stride subsample
        # (reported separately — folding them in would fake a per-iter
        # speedup that is really a per-iter cost cut)
        first_fullK = (ff_refine if ff_stride >= 2 else training_iter) \
            if n_fits else 0
        total_adam_iters = (first_fullK + max(n_fits - 1, 0) * warm_iters
                            if n_fits else 0)
        result["phases"] = {
            "rollout_cones_socp_s": round(t_prior, 4),
            "gp_moments_s": round(t_moments, 4),
            "refit_s": round(t_refit, 4),
            "refit_ms_per_adam_iter": (
                round(t_refit / total_adam_iters * 1e3, 3)
                if n_fits else None),
        }
        if ff_stride >= 2 and n_fits:
            result["phases"]["first_fit_coarse_iters"] = training_iter
            result["phases"]["fullK_adam_iters"] = total_adam_iters

        # --- versioned roofline: analytic per-phase FLOP model -> MFU.
        # Round-3 verdict: the old "HBM stream floor" model was wrong
        # (XLA keeps the (B, k, k) Linv cache VMEM-resident across scan
        # steps, so the moments phase legitimately ran 9.5x "above" a
        # floor that no longer applies).  The corrected floor is compute:
        # time_floor = FLOPs / peak.  The FLOP counts are an ANALYTIC
        # MODEL (e.g. the 3x gram fwd+bwd heuristic), not a measurement,
        # so quoted mfu is an estimate and is clamped/flagged if the
        # model ever overcounts past 1.  Peak: v5e MXU is 197 TFLOP/s
        # bf16; this
        # package pins matmuls to f32-HIGHEST (6 bf16 passes), so the
        # f32 effective peak is 197/6 ~ 32.8 TFLOP/s — MFU is quoted
        # against THAT (the precision we chose to pay for).
        k, xd, mh = max_train, 3, 3
        peak_f32 = 197e12 / 6.0
        # refit, per Adam iteration per episode (chol fit path):
        #   gram fwd+bwd ~ 3x forward poly; factor 2k^3/3; Linv assembly
        #   2k^3/3; Kinv = Linv^T Linv 2k^3 (full bmm); solve+VJP 12 k^2 xd
        f_refit_iter = ((2.0 / 3 + 2.0 / 3 + 2.0) * k ** 3
                        + 3.0 * k * k * (3 * xd + 2 * mh + 6)
                        + 12.0 * k * k * xd)
        F_refit = batch * total_adam_iters * f_refit_iter
        if ff_stride >= 2 and n_fits:
            # coarse first-fit stage: training_iter iterations at
            # k_sub = ceil(k/stride) (same per-iter polynomial)
            ks = -(-k // ff_stride)
            f_coarse = ((2.0 / 3 + 2.0 / 3 + 2.0) * ks ** 3
                        + 3.0 * ks * ks * (3 * xd + 2 * mh + 6)
                        + 12.0 * ks * ks * xd)
            F_refit += batch * training_iter * f_coarse
        # moments, per control step per episode: vb = Linv @ kb dominates
        # (2 k^2 mh), plus kb build and the small Bk/fT contractions
        f_mom_step = 2.0 * k * k * mh + k * (3 * xd + 2 * mh + 20)
        F_moments = batch * num_steps * f_mom_step
        # rollout+cones+SOCP per step: tiny-cone IPM iterations + cone
        # assembly — a few 1e4 FLOPs; latency/VPU-bound by construction
        F_roll = batch * num_steps * 2.5e4

        model_overcount = False

        def mfu(F, t):
            nonlocal model_overcount
            v = F / max(t, 1e-9) / peak_f32
            if v > 1.0:       # analytic FLOP model overcounted
                model_overcount = True
            return round(min(v, 1.0), 5)

        F_total = F_refit + F_moments + F_roll
        result["mfu"] = {
            "peak_tflops_f32_highest": round(peak_f32 / 1e12, 1),
            "refit": {"gflop": round(F_refit / 1e9, 1),
                      "mfu": mfu(F_refit, t_refit) if n_fits else None},
            "moments": {"gflop": round(F_moments / 1e9, 1),
                        "mfu": mfu(F_moments, t_moments)},
            "rollout_socp": {"gflop": round(F_roll / 1e9, 1),
                             "mfu": mfu(F_roll, t_prior)},
            "total_mfu": mfu(F_total, t_full),
            # the refit is VPU-serial bound (masked rank-1 pivot
            # recurrences), not MXU bound: its MFU is the honest
            # statement of that, and the floor that binds it is the
            # serial recurrence, not FLOPs or bandwidth
            "note": "refit phase is VPU-serial-recurrence bound; "
                    "rollout/SOCP is latency bound (4-var cones)",
        }
        if model_overcount:
            result["mfu"]["flop_model_overcount"] = True

    # --- rel-deg-2 pendulum headline (round-4 verdict 3): batched
    # online-learning episodes (CBC2 chance-constraint SOCP per step,
    # scheduled MVGP refits) — the reference's perf centerpiece is
    # pendulum-based (bayes_cbf/pendulum.py:1305-1395, :1041-1048).
    if os.environ.get("BENCH_PENDULUM", "1") == "1" and platform != "cpu":
        from bayesian_cbf_tpu.experiments.pendulum import (
            make_pendulum_online_sim, run_pendulum_online_batch)
        pb = int(os.environ.get("BENCH_PENDULUM_BATCH", "256"))
        th0 = jnp.asarray([7 * math.pi / 12, 0.0], dtype)
        px0s = th0[None, :] + 0.05 * jax.random.normal(
            jax.random.PRNGKey(7), (pb, 2), dtype)

        def run_pendulum(**kw):
            psim = make_pendulum_online_sim(max_train=max_train, **kw)
            t0 = time.perf_counter()
            pout = run_pendulum_online_batch(psim, px0s)
            jax.block_until_ready(pout[0])
            pc = time.perf_counter() - t0
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                pout = run_pendulum_online_batch(psim, px0s)
                jax.block_until_ready(pout[0])
                walls.append(time.perf_counter() - t0)
            # best-of-reps: the record scripts' methodology (CLAUDE.md —
            # single-process timing on the tunneled chip is noisy high)
            pw = min(walls)
            return {
                "steps_per_sec": round(pb * psim.numSteps / pw, 1),
                "wall_s_per_batch": round(pw, 4),
                "compile_plus_first_s": round(pc, 1),
                "finite": bool(jnp.all(jnp.isfinite(pout[0]))),
                "certified_frac": round(
                    float(jnp.mean(pout[3]["certified"])), 4),
                "feasible_frac": round(
                    float(jnp.mean(pout[3]["feasible"])), 4),
            }

        # headline: continuous rank-1 posterior updates (every sample
        # enters the posterior the step it is observed — a capability
        # the reference lacks) + sparse warm hyperparameter refits.
        # Outcome-gated on chip (check_outcomes pendulum_batched_cu):
        # damage/wedge 0.0 across the batch, all episodes parked above
        # the wedge edge.  The reference-schedule anchor (refit every
        # 10 steps, pendulum.py:919) is attached below, same honesty
        # contract as the unicycle training_iter_warm headline.
        # Two-stage first fit at (stride=3, refine=5): the pendulum's
        # cold-start fit is only 25 iters, so the coarse stage buys less
        # than the unicycle's — but refine=5 (the CU config's own warm
        # budget; continuous updates keep the posterior fresh) measured
        # 92.8k -> 103.9k steps/s in one process with damage/wedge/
        # parked/feasible identical (records pendulum_first_fit_twostage_ab).
        result["pendulum"] = {
            "batch": pb, "episode_steps": 250, "max_train": max_train,
            "config": {"continuous_updates": True,
                       "train_every_n_steps": 100,
                       "training_iter_warm": 5,
                       "first_fit_coarse_stride": 3,
                       "first_fit_refine_iter": 5},
            **run_pendulum(continuous_updates=True,
                           train_every_n_steps=100,
                           training_iter_warm=5,
                           first_fit_coarse_stride=3,
                           first_fit_refine_iter=5),
        }
        if os.environ.get("BENCH_PENDULUM_REF", "1") == "1":
            pwarm = int(os.environ.get("BENCH_PENDULUM_WARM", "10"))
            result["pendulum"]["reference_schedule"] = {
                "config": {"train_every_n_steps": 10,
                           "training_iter_warm": pwarm},
                **run_pendulum(training_iter_warm=pwarm),
            }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
