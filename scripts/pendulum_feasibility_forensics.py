#!/usr/bin/env python
"""Feasibility forensics on the rel-deg-2 pendulum stack (round-4
verdict 1).

The flagship pendulum run executes the in-graph fallback on a large
fraction of steps (round-4 record: 18.5%; chaotic 0.22-0.96 across
benign numerics variants).  The reference would CRASH on any such step
(bayes_cbf/optimizers.py:74-86 raises InfeasibleProblemError), so a
completed reference run certifies every step — we owe a classification
of ours:

  (a) GENUINE  — no u satisfies the CBC cone at all (the chance
      constraint is unsatisfiable; the reference would have died here);
  (b) STALL    — a strictly feasible u exists but the f32 IPM did not
      find it within socp_iters iterations;
  (c) TOLCAL   — the returned x is (near-)feasible in the true cone
      residual but sol.pres sits above the 5e-3 f32 gate.

Method: run the flagship single-episode + batched configs with
`debug_cones=True` (the controller stores G, h, u_ref, x_sol per step),
then classify every infeasible step OFFLINE in f64 numpy.  The CBC cone
acts on the scalar u alone (delta / y columns are zero), so the exact
infeasibility question  min_u rho*||A u + b|| - (c^T u + d)  is a 1-D
problem solved to machine precision by dense-grid + local refinement —
no SLSQP needed, and the verdict is a certificate, not a heuristic.

Writes one JSON record (item=pendulum_feasibility_forensics) to
records/tpu_round5.jsonl and dumps the captured cones of the infeasible
steps to records/pendulum_infeasible_cones.npz for reproduction.

Env knobs: PF_B (batch, default 64), PF_SINGLE=1 (also run the single
episode), PF_WARM (training_iter_warm), PF_ITERS (socp_iters override).
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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "records", "tpu_round5.jsonl")


def cone_min_violation(G_cbc, h_cbc, u_grid):
    """min_u ||(h - G [u,0,0])[1:]|| - (h - G [u,0,0])[0] for a batch of
    cones, exactly (1-D dense grid + parabolic refine), f64.

    G_cbc: (N, rows, nvar), h_cbc: (N, rows).  Returns (min_viol (N,),
    argmin u (N,)).  Cone layout: s = h - G x, feasible iff
    ||s[1:]|| <= s[0]."""
    G_cbc = np.asarray(G_cbc, np.float64)
    h_cbc = np.asarray(h_cbc, np.float64)
    # only the u column (0) matters; delta/y columns are structurally 0
    g_u = G_cbc[:, :, 0]                                  # (N, rows)
    viol_best = np.full(G_cbc.shape[0], np.inf)
    u_best = np.zeros(G_cbc.shape[0])
    # chunk the grid to bound memory: (N, chunk, rows)
    for lo in range(0, u_grid.size, 4096):
        ug = u_grid[lo:lo + 4096]
        s = h_cbc[:, None, :] - g_u[:, None, :] * ug[None, :, None]
        viol = np.linalg.norm(s[:, :, 1:], axis=-1) - s[:, :, 0]
        i = viol.argmin(axis=1)
        v = viol[np.arange(viol.shape[0]), i]
        upd = v < viol_best
        viol_best[upd] = v[upd]
        u_best[upd] = ug[i[upd]]
    # local golden refine around the best grid point
    for _ in range(60):
        step = np.maximum(np.abs(u_best) * 1e-3, 1e-6)
        for delta in (-1.0, 1.0):
            u_try = u_best + delta * step
            s = h_cbc - g_u * u_try[:, None]
            v = np.linalg.norm(s[:, 1:], axis=-1) - s[:, 0]
            upd = v < viol_best
            viol_best[upd] = v[upd]
            u_best[upd] = u_try[upd]
    return viol_best, u_best


def true_residual(G, h, dims, x):
    """max over cones of ||s[1:]|| - s[0] (>0 means violated), f64."""
    G = np.asarray(G, np.float64)
    h = np.asarray(h, np.float64)
    x = np.asarray(x, np.float64)
    s = h - G @ x
    worst = -np.inf
    o = 0
    for d in dims:
        sk = s[o:o + d]
        worst = max(worst, float(np.linalg.norm(sk[1:]) - sk[0]))
        o += d
    return worst


def main():
    from bayesian_cbf_tpu.experiments.pendulum import (
        make_pendulum_online_sim, run_pendulum_online_batch,
        pendulum_damage_fraction, pendulum_wedge_fraction)
    from bayesian_cbf_tpu.solvers import socp as socp_mod

    B = int(os.environ.get("PF_B", "64"))
    warm = int(os.environ.get("PF_WARM", "0"))
    iters = int(os.environ.get("PF_ITERS", "25"))
    kw = {"training_iter_warm": warm} if warm else {}
    sim = make_pendulum_online_sim(max_train=200, socp_iters=iters, **kw)
    sim = sim._replace(controller=sim.controller._replace(debug_cones=True))

    th0 = jnp.asarray([7 * math.pi / 12, 0.0], jnp.float32)
    x0s = th0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), (B, 2), jnp.float32)

    t0 = time.time()
    X, U, Xdot, info = run_pendulum_online_batch(sim, x0s)
    jax.block_until_ready(info["pres"])
    wall = time.time() - t0

    feas = np.asarray(info["feasible"])            # (B, T)
    pres = np.asarray(info["pres"])
    G = np.asarray(info["G"])                      # (B, T, rows, nvar)
    h = np.asarray(info["h"])                      # (B, T, rows)
    u_ref = np.asarray(info["u_ref"])
    x_sol = np.asarray(info["x_sol"])
    Xn = np.asarray(X)
    T = feas.shape[1]
    # cone layout: objective (3 rows), CBC (3 rows) [, s>=0 (1 row) when
    # the relaxation is on — then `certified` marks slack ~ 0 steps]
    relaxed = "certified" in info
    dims = (3, 3, 1) if G.shape[2] == 7 else (3, 3)

    # classify the steps the hard chance constraint did NOT certify
    bad = ~np.asarray(info["certified"]) if relaxed else ~feas
    nbad = int(bad.sum())
    idx_b, idx_t = np.nonzero(bad)
    print(f"uncertified steps: {nbad}/{feas.size} "
          f"(frac {nbad / feas.size:.4f}), wall {wall:.1f}s")

    # classify every infeasible step from its CBC cone (rows 3:6)
    G_cbc = G[idx_b, idx_t, 3:6, :]
    h_cbc = h[idx_b, idx_t, 3:6]
    u_grid = np.unique(np.concatenate([
        np.linspace(-1e4, 1e4, 200001),
        np.linspace(-50, 50, 100001)]))
    min_viol, u_star = cone_min_violation(G_cbc, h_cbc, u_grid)

    genuine = min_viol > 1e-6
    feasible_exists = min_viol < -1e-6
    marginal = ~genuine & ~feasible_exists

    # of the feasible-exists ones: was the returned x actually
    # near-feasible (tolerance miscalibration) or truly off (IPM stall /
    # — under the relaxation — slack used although certification was
    # possible)?
    tolcal = np.zeros(nbad, bool)
    scale = 1.0 + np.abs(h[idx_b, idx_t]).max(axis=-1)
    for i in np.nonzero(feasible_exists)[0]:
        r = true_residual(G[idx_b[i], idx_t[i]], h[idx_b[i], idx_t[i]],
                          dims, x_sol[idx_b[i], idx_t[i]])
        tolcal[i] = r < 1e-3 * scale[i]
    stall = feasible_exists & ~tolcal
    tolcal_n = int(tolcal.sum())

    # reattempt the stalled ones with the SAME f32 IPM, more iterations
    # (hard-cone capture only; under the relaxation the program is
    # always feasible, so the retry says nothing)
    stall_idx = np.nonzero(stall)[0]
    retry_fixed = None
    if stall_idx.size and not relaxed:
        sub = stall_idx[:256]
        cvec = np.zeros((sub.size, 3), np.float32)
        cvec[:, 2] = 1.0
        Gb = jnp.asarray(G[idx_b[sub], idx_t[sub]], jnp.float32)
        hb = jnp.asarray(h[idx_b[sub], idx_t[sub]], jnp.float32)
        sol = jax.jit(jax.vmap(lambda cc, GG, hh: socp_mod.solve_socp(
            cc, GG, hh, dims, iters=60)))(jnp.asarray(cvec), Gb, hb)
        retry_fixed = int(np.sum(np.asarray(sol.pres) < 5e-3))

    # where in the episode do the infeasible steps live?
    t_hist = np.histogram(idx_t, bins=10, range=(0, T))[0].tolist()
    # posterior-conditioned diagnosis: CBC mean/var at u0 on bad steps
    cm = np.asarray(info["cbc_mean"])[idx_b, idx_t].min(axis=-1)
    cv = np.asarray(info["cbc_var"])[idx_b, idx_t]

    dmg = np.array([pendulum_damage_fraction(Xn[b, :, 0]) for b in range(B)])
    rec = {
        "item": "pendulum_feasibility_forensics",
        "B": B, "numSteps": T, "max_train": 200, "socp_iters": iters,
        "training_iter_warm": warm,
        "platform": jax.devices()[0].platform,
        "relaxed": relaxed,
        "feasible_frac": round(float(feas.mean()), 4),
        "certified_frac": (round(
            float(np.asarray(info["certified"]).mean()), 4)
            if relaxed else None),
        "n_uncertified": nbad,
        "classes": {
            "genuine": int(genuine.sum()),
            "stall": int(stall.sum()),
            "tolcal": tolcal_n,
            "marginal": int(marginal.sum()),
        },
        "retry60_fixed_of_first256_stalls": retry_fixed,
        "min_viol_quantiles": [round(float(q), 5) for q in np.quantile(
            min_viol, [0.0, 0.25, 0.5, 0.75, 1.0])] if nbad else [],
        "infeasible_step_hist10": t_hist,
        "cbc_mean_median_bad": round(float(np.median(cm)), 4) if nbad else None,
        "cbc_var_median_bad": (round(float(np.median(cv.min(axis=-1))), 6)
                               if nbad else None),
        "mean_damage": round(float(dmg.mean()), 4),
        "wall_s": round(wall, 1),
    }
    os.makedirs(os.path.join(ROOT, "records"), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1))

    cap = min(nbad, 2000)
    np.savez(os.path.join(ROOT, "records", "pendulum_infeasible_cones.npz"),
             G=G[idx_b[:cap], idx_t[:cap]], h=h[idx_b[:cap], idx_t[:cap]],
             x_sol=x_sol[idx_b[:cap], idx_t[:cap]],
             pres=pres[idx_b[:cap], idx_t[:cap]],
             u_ref=u_ref[idx_b[:cap], idx_t[:cap]],
             t=idx_t[:cap], b=idx_b[:cap],
             min_viol=min_viol[:cap], u_star=u_star[:cap],
             dims=np.asarray(dims))


if __name__ == "__main__":
    main()
