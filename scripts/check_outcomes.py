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


def kernel_parity_checks():
    """Mosaic-compiled vs interpret parity for every production Pallas
    kernel at flagship shapes on trajectory-conditioned data (round-3
    verdict 3: compiled-kernel correctness previously had no automated
    on-chip gate — the FIT_INVERSE='xla' escape hatch existed precisely
    because this risk was real).

    Residual-based where conditioning matters: the verdict is
    resid_compiled < max(abs_floor, 3 * resid_interpret), i.e. the
    compiled kernel may not be meaningfully WORSE than its interpret
    semantics on the same data.  Set OUTCOMES_KERNEL_PERTURB to
    fit|factor|sweep|gram|ipm to deliberately corrupt one compiled
    result and prove the verdict trips (audit knob)."""
    from bayesian_cbf_tpu.ops import cholinv
    from bayesian_cbf_tpu.ops import pallas_sweep as ps
    from bayesian_cbf_tpu.ops.pallas_chol import batched_chol_with_inv
    from bayesian_cbf_tpu.ops.gram import (fused_gram_kb,
                                           fused_gram_kb_reference)
    from bayesian_cbf_tpu.solvers import socp as socp_mod

    perturb = os.environ.get("OUTCOMES_KERNEL_PERTURB", "")
    rng = np.random.default_rng(42)
    B, k, xd = 256, 200, 3
    X = np.cumsum(0.02 * rng.normal(size=(B, k, xd)), 1).astype(np.float32)
    d = X[:, :, None, :] - X[:, None, :, :]
    K = (np.exp(-0.5 * np.sum(d * d, -1))
         + 2.5e-4 * np.eye(k, dtype=np.float32)).astype(np.float32)
    K = jnp.asarray(K)
    sample = (0, 17, 101, 255)

    def resid(Kinv, idx=sample):
        r = 0.0
        for i in idx:
            r = max(r, float(np.max(np.abs(
                np.asarray(Kinv[i], np.float64)
                @ np.asarray(K[i], np.float64) - np.eye(k)))))
        return r

    checks = {}

    # 1. the batched FIT inversion (whatever FIT_INVERSE selects)
    Ki_c, ld_c = cholinv.batched_kinv_logdet_fit(K)
    Ki_i, ld_i = cholinv.batched_kinv_logdet_fit(K, interpret=True)
    if perturb == "fit":
        Ki_c = Ki_c + 1.0
    rc, ri = resid(Ki_c), resid(Ki_i)
    checks["fit_inverse"] = {
        "resid_compiled": round(rc, 5), "resid_interpret": round(ri, 5),
        "logdet_maxdiff": round(float(jnp.max(jnp.abs(ld_c - ld_i))), 5),
        "ok": bool(rc < max(5e-2, 3 * ri)
                   and float(jnp.max(jnp.abs(ld_c - ld_i))) < 0.5)}

    # 2. the refresh_cache factorization kernel (L, Linv)
    _, Linv_c = batched_chol_with_inv(K)
    _, Linv_i = batched_chol_with_inv(K, interpret=True)
    if perturb == "factor":
        Linv_c = Linv_c + 1.0
    Kc = jnp.swapaxes(Linv_c, -1, -2) @ Linv_c
    Kii = jnp.swapaxes(Linv_i, -1, -2) @ Linv_i
    rc, ri = resid(Kc), resid(Kii)
    checks["chol_with_inv"] = {
        "resid_compiled": round(rc, 5), "resid_interpret": round(ri, 5),
        "ok": bool(rc < max(5e-2, 3 * ri))}

    # 3. the Schur/sweep kernel on its supported (well-conditioned) regime
    Kw = K + jnp.eye(k, dtype=jnp.float32)
    Sw_c, lds_c = ps.batched_kinv_logdet(Kw)
    Sw_i, lds_i = ps.batched_kinv_logdet(Kw, interpret=True)
    if perturb == "sweep":
        Sw_c = Sw_c + 1.0

    def resid_w(Kinv):
        r = 0.0
        for i in sample:
            r = max(r, float(np.max(np.abs(
                np.asarray(Kinv[i], np.float64)
                @ np.asarray(Kw[i], np.float64) - np.eye(k)))))
        return r
    rc, ri = resid_w(Sw_c), resid_w(Sw_i)
    checks["sweep"] = {
        "resid_compiled": round(rc, 6), "resid_interpret": round(ri, 6),
        "logdet_maxdiff": round(float(jnp.max(jnp.abs(lds_c - lds_i))), 6),
        "ok": bool(rc < max(1e-2, 3 * ri)
                   and float(jnp.max(jnp.abs(lds_c - lds_i))) < 0.1)}

    # 4. the fused inference Gram kernel vs its XLA oracle
    Xs = jnp.asarray(X[0])
    UHB = jnp.asarray(rng.normal(size=(k, 3)).astype(np.float32))
    mask = jnp.ones((k,), jnp.float32).at[k - 7:].set(0.0)
    g_c = fused_gram_kb(Xs, UHB, mask, jnp.float32(1.3), jnp.float32(1e-4))
    g_r = fused_gram_kb_reference(Xs, UHB, mask, jnp.float32(1.3),
                                  jnp.float32(1e-4))
    if perturb == "gram":
        g_c = g_c + 1.0
    gd = float(jnp.max(jnp.abs(g_c - g_r)))
    checks["fused_gram"] = {"maxdiff": round(gd, 8), "ok": bool(gd < 1e-4)}

    # 5. the whole-solve IPM kernel vs the plain path, controller cones
    nvar, m = 4, 2
    Bi = 64
    w = rng.normal(size=(Bi, m)).astype(np.float32)
    A0 = np.zeros((Bi, m + 1, nvar), np.float32)
    A0[:, :m, :m] = np.eye(m, dtype=np.float32)
    A0[:, m, m] = 1.0
    # objective epigraph tracks u -> w (nontrivial optimum), CBC-like
    # cone ||0.3 u + w|| <= u_0 + 1.5 is active for some batch elements
    b0 = np.concatenate([-w, np.zeros((Bi, 1), np.float32)], 1)
    cobj = np.zeros((Bi, nvar), np.float32)
    cobj[:, m + 1] = 1.0
    Gs = np.concatenate([
        -np.concatenate([cobj[:, None, :], A0], 1),
        -np.concatenate([np.tile(np.array([[1., 0., 0., 0.]],
                                          np.float32), (Bi, 1, 1)),
                         np.concatenate([0.3 * A0[:, :m, :],
                                         np.zeros((Bi, 1, nvar),
                                                  np.float32)], 1)], 1)],
        axis=1)
    hs = np.concatenate([
        np.concatenate([np.zeros((Bi, 1), np.float32), b0], 1),
        np.concatenate([1.5 * np.ones((Bi, 1), np.float32), w,
                        np.zeros((Bi, 1), np.float32)], 1)], axis=1)
    dims = (m + 2, m + 2)
    G = jnp.asarray(Gs)
    h = jnp.asarray(hs)
    c = jnp.asarray(cobj)

    def solve_batch():
        return jax.jit(jax.vmap(
            lambda cc, GG, hh: socp_mod.solve_socp(
                cc, GG, hh, dims, iters=25).x))(c, G, h)

    old = socp_mod.USE_PALLAS_IPM
    try:
        socp_mod.USE_PALLAS_IPM = True
        x_k = solve_batch()
        socp_mod.USE_PALLAS_IPM = False
        x_p = solve_batch()
    finally:
        socp_mod.USE_PALLAS_IPM = old
    if perturb == "ipm":
        x_k = x_k + 1.0
    dx = float(jnp.max(jnp.abs(x_k - x_p)))
    checks["ipm"] = {"x_maxdiff": round(dx, 6),
                     "finite": bool(jnp.all(jnp.isfinite(x_k))),
                     "ok": bool(dx < 1e-3 and jnp.all(jnp.isfinite(x_k)))}

    return checks


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
    # Two-stage first-fit gating knob: >=2 runs the LEARNING experiments
    # with the coarse-subsample + full-K-refine first fit — same adoption
    # protocol as the warm knob (records first_fit_twostage_ab).
    ff_stride = int(os.environ.get("OUTCOMES_FIRST_FIT_STRIDE", "0"))
    if ff_stride >= 2:
        learn_kw["first_fit_coarse_stride"] = ff_stride
        learn_kw["first_fit_refine_iter"] = int(
            os.environ.get("OUTCOMES_FIRST_FIT_REFINE", "15"))
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
        "certified": round(float(np.mean(np.asarray(info["certified"]))), 4),
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
        # Round-5 semantics: the CBC cones carry an exact-penalty slack
        # (learned_socp_controller.cbc_relax), so `feasible` means the
        # IPM CONVERGED on the always-strictly-feasible relaxed program
        # (floor-gated at 0.95 in `feasibility_floor` below), while
        # `certified` is the fraction of steps whose hard chance
        # constraint held (slack ~ 0).  Certified fraction is recorded
        # but not floor-gated: forensics proved the uncertified steps
        # are GENUINELY unsatisfiable cones (min-violation 14-42 over
        # all u; records pendulum_feasibility_forensics), on which the
        # executed control is the max-safety argmin — the load-bearing
        # verdicts are the outcomes: no damage, (near-)zero wedge
        # occupancy, parked between the wedge edge and the start angle.
        "pendulum_online_no_damage":
            res["pendulum_online"]["damage"] == 0.0
            and res["pendulum_online"]["finite"]
            and res["pendulum_online"]["wedge_frac"] <= 0.02
            and (math.pi / 4 + math.pi / 8 - 0.02
                 < res["pendulum_online"]["theta_end"] < 1.9),
        # the ground-truth QP must hold the barrier exactly: parks at the
        # wedge edge (theta ~1.18-1.45), never enters, solver clean
        "pendulum_gt_safe":
            res["pendulum_ground_truth"]["wedge_frac"] == 0.0
            and res["pendulum_ground_truth"]["damage"] == 0.0
            and res["pendulum_ground_truth"]["max_pres"] < 1e-4
            and (math.pi / 4 + math.pi / 8 - 0.05
                 < res["pendulum_ground_truth"]["theta_end"] < 1.45),
    })
    # --- BATCHED pendulum outcomes (round-3 verdict 7: the rel-deg-2
    # stack gets the same batched-kernel-path evidence the unicycle has)
    from bayesian_cbf_tpu.experiments.pendulum import (
        run_pendulum_online_batch)
    bpsim = make_pendulum_online_sim(max_train=200, **learn_kw)
    Bp_ = 64
    th0 = jnp.asarray([7 * math.pi / 12, 0.0], jnp.float32)  # the
    # reference episode start (pendulum.py:1041-1048), perturbed
    px0s = th0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), (Bp_, 2), jnp.float32)
    pX, pU, pXdot, pinfo = run_pendulum_online_batch(bpsim, px0s)
    pX = np.asarray(pX)
    dmg = np.array([pendulum_damage_fraction(pX[b, :, 0])
                    for b in range(Bp_)])
    wdg = np.array([pendulum_wedge_fraction(pX[b, :, 0])
                    for b in range(Bp_)])
    res["pendulum_batched"] = {
        "B": Bp_,
        "mean_damage": round(float(dmg.mean()), 4),
        "frac_damaged": round(float((dmg > 0).mean()), 4),
        "mean_wedge_frac": round(float(wdg.mean()), 4),
        "frac_wedge_gt_2pct": round(float((wdg > 0.02).mean()), 4),
        "finite": bool(np.all(np.isfinite(pX))),
        "feasible": round(float(np.mean(np.asarray(pinfo["feasible"]))), 4),
        "certified": round(
            float(np.mean(np.asarray(pinfo["certified"]))), 4),
    }
    # Chance-constraint semantics: the CBC certifies P(unsafe) <= delta
    # = max_unsafe_prob = 0.01 PER STEP, and the reference control is
    # fully epsilon-greedy-perturbed early in every episode — so over
    # B x numSteps steps a small unsafe-step fraction is the EXPECTED
    # behavior, not a regression.  Measured baseline (both chol and
    # cholk fit paths, same seeds, round 4): exactly one episode of 64
    # grazes the damage region (mean_damage 0.0011-0.0014 of steps =
    # ~10x better than the delta bound).  Gate on the bound, not on
    # zero-tail over 16k step-episodes.
    verdicts["pendulum_batched_safe"] = (
        res["pendulum_batched"]["mean_damage"] <= 0.01
        and res["pendulum_batched"]["frac_damaged"] <= 0.05
        and res["pendulum_batched"]["frac_wedge_gt_2pct"] <= 0.05
        and res["pendulum_batched"]["finite"])

    # --- BATCHED pendulum, continuous-updates fast config (the bench
    # headline: per-step rank-1 posterior appends + sparse warm refits;
    # round-5).  Same safety verdicts as the reference-schedule batch.
    cusim = make_pendulum_online_sim(max_train=200, continuous_updates=True,
                                     train_every_n_steps=100,
                                     training_iter_warm=5,
                                     first_fit_coarse_stride=3,
                                     first_fit_refine_iter=5)
    cX, cU, cXdot, cinfo = run_pendulum_online_batch(cusim, px0s)
    cX = np.asarray(cX)
    cdmg = np.array([pendulum_damage_fraction(cX[b, :, 0])
                     for b in range(Bp_)])
    cwdg = np.array([pendulum_wedge_fraction(cX[b, :, 0])
                     for b in range(Bp_)])
    res["pendulum_batched_cu"] = {
        "B": Bp_,
        "mean_damage": round(float(cdmg.mean()), 4),
        "frac_damaged": round(float((cdmg > 0).mean()), 4),
        "frac_wedge_gt_2pct": round(float((cwdg > 0.02).mean()), 4),
        "finite": bool(np.all(np.isfinite(cX))),
        "feasible": round(float(np.mean(np.asarray(cinfo["feasible"]))), 4),
        "certified": round(
            float(np.mean(np.asarray(cinfo["certified"]))), 4),
        "theta_end_range": [round(float(cX[:, -1, 0].min()), 3),
                            round(float(cX[:, -1, 0].max()), 3)],
    }
    verdicts["pendulum_batched_cu_safe"] = (
        res["pendulum_batched_cu"]["mean_damage"] <= 0.01
        and res["pendulum_batched_cu"]["frac_damaged"] <= 0.05
        and res["pendulum_batched_cu"]["frac_wedge_gt_2pct"] <= 0.05
        and res["pendulum_batched_cu"]["finite"]
        and res["pendulum_batched_cu"]["feasible"] >= 0.95
        and res["pendulum_batched_cu"]["theta_end_range"][0]
            > math.pi / 4 + math.pi / 8)

    # --- solver feasibility floor, BOTH stacks (round-4 verdict weak 7:
    # a solver regression that halves feasibility while outcomes stay
    # lucky must fail the gate).  `feasible` = the IPM converged on the
    # step's program (pendulum: the relaxed, always-strictly-feasible
    # cone set; unicycle: the hard cone set whose measured baseline is
    # ~1.0).
    verdicts["feasibility_floor"] = (
        res["bayes_cbf"]["feasible"] >= 0.95
        and res["learning"]["feasible"] >= 0.95
        and res["pendulum_online"]["feasible"] >= 0.95
        and res["pendulum_batched"]["feasible"] >= 0.95)

    # --- Mosaic-vs-interpret kernel parity (round-3 directive 3) ---
    kp = kernel_parity_checks()
    res["kernel_parity"] = kp
    verdicts["kernel_parity"] = all(v["ok"] for v in kp.values())

    out = {"results": res, "verdicts": verdicts,
           "all_pass": all(verdicts.values()),
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out))
    return 0 if out["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
