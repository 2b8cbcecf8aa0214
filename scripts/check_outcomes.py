#!/usr/bin/env python
"""On-chip qualitative-outcome gate: run the four README experiments and
print the FULL verdict set — including goal-reaching, not just
clearance.  Run this (on the TPU) after ANY change to solver/fit/kernel
numerics; the round-2 dot-form-Gram regression flipped ONLY the
learning-helps goal progress while every clearance-based check stayed
green (see NOTES_round2.md).

Exit code 1 if any verdict fails.
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


def _wait_for_backend(attempts=10, sleep_s=60):
    """Tunneled-TPU init intermittently fails UNAVAILABLE; retry before
    letting the gate die (same guard as scripts/warm_refit_ab.py)."""
    for _ in range(attempts):
        try:
            return jax.devices()
        except RuntimeError:
            time.sleep(sleep_s)
    return jax.devices()


def main():
    _wait_for_backend()
    from bayesian_cbf_tpu.experiments.unicycle import (
        unicycle_mean_cbf_collides_obstacle,
        unicycle_bayes_cbf_safe_obstacle,
        unicycle_learning_helps_avoid_getting_stuck,
        unicycle_no_learning_gets_stuck,
        min_obstacle_clearance, goal_distance, realized_cbc_margins)
    # Warm-refit gating knob: >0 runs the LEARNING experiments with
    # reduced-budget warm refits (training_iter_warm) so the semantics
    # change can be outcome-gated on chip before the bench adopts it.
    warm_iters = int(os.environ.get("OUTCOMES_TRAINING_ITER_WARM", "0"))
    learn_kw = {"training_iter_warm": warm_iters} if warm_iters else {}
    # First-fit gating knob: >0 runs the LEARNING experiments with a
    # reduced FIRST-fit Adam budget (training_iter) — same adoption
    # protocol as the warm knob (records first_fit_iters_ab).
    first_iters = int(os.environ.get("OUTCOMES_TRAINING_ITER", "0"))
    if first_iters:
        learn_kw["training_iter"] = first_iters
    t0 = time.time()
    res = {}
    for name, fn, kw in [
            ("mean_cbf", unicycle_mean_cbf_collides_obstacle, {}),
            ("bayes_cbf", unicycle_bayes_cbf_safe_obstacle, {}),
            ("learning", unicycle_learning_helps_avoid_getting_stuck,
             learn_kw),
            ("no_learning", unicycle_no_learning_gets_stuck, {})]:
        sim, out = fn(**kw)
        res[name] = {
            "min_clearance": round(float(jnp.min(jnp.asarray(
                min_obstacle_clearance(sim, out)))), 4),
            "goal_dist": round(float(np.asarray(goal_distance(out))), 4),
            "feasible": round(float(out.info.feasible.mean()), 4),
        }
        if name == "bayes_cbf":
            # audit the f32 feasibility gate: among feasible-marked
            # steps, the realized CBC chance-constraint margin at the
            # applied u must not be meaningfully negative (static-GP
            # config, so the audit posterior == the in-scan posterior)
            mg = np.asarray(realized_cbc_margins(sim, out))
            feas = np.asarray(out.info.feasible) > 0.5
            worst = float(mg[feas].min()) if feas.any() else float("nan")
            scale = float(np.median(np.abs(mg))) or 1.0
            res[name]["min_feasible_cbc_margin"] = round(worst, 5)
            res[name]["cbc_margin_scale"] = round(scale, 4)
    verdicts = {
        "collides": res["mean_cbf"]["min_clearance"] < 0,
        "safe": res["bayes_cbf"]["min_clearance"] > 0,
        # weak-9 cross-check: the 5e-3-relative-pres f32 gate must not
        # admit controls that violate a safety cone beyond f32 slack
        # (1% of the typical margin magnitude)
        "feasible_steps_respect_cbc":
            res["bayes_cbf"]["min_feasible_cbc_margin"]
            > -0.01 * res["bayes_cbf"]["cbc_margin_scale"],
        # the full learning claim: strictly better goal progress than
        # no-learning AND actually approaches the goal (reference ends
        # near the goal; the stuck run stays ~3.2 away)
        "learning_passes": (res["learning"]["goal_dist"]
                            < res["no_learning"]["goal_dist"] - 1.0
                            and res["learning"]["goal_dist"] < 1.5),
        "no_learning_stuck": res["no_learning"]["goal_dist"] > 2.5,
    }

    # --- BATCHED learning outcomes (the Pallas kernel fit path) ---
    # The single-episode runs above are unbatched => XLA fit path; the
    # flagship MC/bench run the vmapped kernel path, which the round-3
    # sweep-fit regression silently killed (records:
    # fit_inverse_regression_root_cause) while every verdict above
    # stayed green.  A small perturbed-start batch through the real
    # batched runner gates that path on goal progress too.
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START, STATE_GOAL)
    from bayesian_cbf_tpu.sim.rollout import _simulate_unicycle_batch
    bsim = make_ackermann_tracking_sim(
        max_risk=0.01, enable_learning=True, train_every_n_steps=400,
        true_L=1.0, mean_L=12.0, kernel_diag_A=(1.0, 1.0, 1.0),
        **learn_kw)
    Bb = 32
    x0 = jnp.asarray(STATE_START, jnp.float32)
    x0s = x0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(0), (Bb, 3), jnp.float32)
    bkeys = jax.random.split(jax.random.PRNGKey(1), Bb)
    bout = jax.jit(lambda a, k: _simulate_unicycle_batch(bsim, a, k))(
        x0s, bkeys)
    from bayesian_cbf_tpu.parallel.mesh import rollout_safety_stats
    centers = jnp.stack([c.center for c in bsim.cbfs])
    radii = jnp.stack([jnp.asarray(c.radius) for c in bsim.cbfs])
    stats = rollout_safety_stats(bout, centers, radii,
                                 jnp.asarray(STATE_GOAL))
    gd = jnp.linalg.norm(bout.X[:, -1, :2]
                         - jnp.asarray(STATE_GOAL)[:2], axis=-1)
    res["batched_learning"] = {
        "B": Bb,
        "mean_goal_dist": round(float(stats["mean_goal_distance"]), 4),
        "frac_goal_lt_1": round(float(jnp.mean(gd < 1.0)), 4),
        "min_clearance": round(float(stats["min_clearance"]), 4),
        "finite": bool(jnp.all(jnp.isfinite(bout.X))),
    }
    verdicts["batched_learning_passes"] = (
        res["batched_learning"]["mean_goal_dist"] < 1.5
        and res["batched_learning"]["frac_goal_lt_1"] > 0.7
        and res["batched_learning"]["min_clearance"] > 0
        and res["batched_learning"]["finite"])

    # --- pendulum outcomes (round-3 directive 7: the rel-deg-2 stack) ---
    import math
    from bayesian_cbf_tpu.experiments.pendulum import (
        make_pendulum_online_sim, run_pendulum_online_learning,
        run_pendulum_ground_truth, pendulum_damage_fraction,
        pendulum_wedge_fraction)
    sim = make_pendulum_online_sim(max_train=200, **learn_kw)  # flagship cfg
    X, U, Xdot, info = run_pendulum_online_learning(sim)
    X = np.asarray(X)
    res["pendulum_online"] = {
        "damage": round(float(pendulum_damage_fraction(X[:, 0])), 4),
        "wedge_frac": round(float(pendulum_wedge_fraction(X[:, 0])), 4),
        "theta_end": round(float(X[-1, 0]), 4),
        "feasible": round(float(np.mean(np.asarray(info["feasible"]))), 4),
        "finite": bool(np.all(np.isfinite(X))),
    }
    Xg, Ug, pres = run_pendulum_ground_truth()
    Xg = np.asarray(Xg)
    res["pendulum_ground_truth"] = {
        "damage": round(float(pendulum_damage_fraction(Xg[:, 0])), 4),
        "wedge_frac": round(float(pendulum_wedge_fraction(Xg[:, 0])), 4),
        "theta_end": round(float(Xg[-1, 0]), 4),
        "max_pres": float(np.max(np.asarray(pres))),
    }
    verdicts.update({
        # the reference damage indicator (pendulum.py:206) must be clean
        # for BOTH the learned online episode and the ground-truth QP.
        # Feasible-fraction is NOT gated tightly: it is chaotic across
        # benign numerics changes (measured 0.22-0.96 across precision
        # variants whose damage/wedge outcomes were all clean) — a
        # trajectory that hovers just OUTSIDE the barrier has many
        # hard-to-certify steps that fall back to u_ref safely, while
        # the round-2 stack actually ENTERED the wedge 15% of steps.
        # The load-bearing verdicts: no damage, (near-)zero wedge
        # occupancy, parked between the wedge edge and the start angle,
        # and the solver not collapsed outright.
        "pendulum_online_no_damage":
            res["pendulum_online"]["damage"] == 0.0
            and res["pendulum_online"]["finite"]
            and res["pendulum_online"]["wedge_frac"] <= 0.02
            and (math.pi / 4 + math.pi / 8 - 0.02
                 < res["pendulum_online"]["theta_end"] < 1.9)
            and res["pendulum_online"]["feasible"] > 0.3,
        # the ground-truth QP must hold the barrier exactly: parks at the
        # wedge edge (theta ~1.18-1.45), never enters, solver clean
        "pendulum_gt_safe":
            res["pendulum_ground_truth"]["wedge_frac"] == 0.0
            and res["pendulum_ground_truth"]["damage"] == 0.0
            and res["pendulum_ground_truth"]["max_pres"] < 1e-4
            and (math.pi / 4 + math.pi / 8 - 0.05
                 < res["pendulum_ground_truth"]["theta_end"] < 1.45),
    })
    out = {"results": res, "verdicts": verdicts,
           "all_pass": all(verdicts.values()),
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out))
    return 0 if out["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
