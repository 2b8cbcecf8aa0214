#!/usr/bin/env python
"""Round-3 directive 3: close the self-triggered-tau parity question.

Three artifacts, one record (records/tpu_round3.jsonl:trigger_parity):

1. **Same-inputs parity (the gold check)**: run OUR vectorized Eq.-11
   pipeline (observability/trigger.py) on the REFERENCE'S OWN logged
   learning run — the vis/knl_*, vis/state, vis/xtp1, vis/uopt channels
   of docs/saved-runs/unicycle_move_to_pose_fixed_learning_helps_...
   (the exact events file trigger_interval.py:86-177 consumes).  If our
   math is parity, the resulting tau distribution must land in
   BASELINE.md's tau in [2.05e-4, 1.2e-3] / L_fk median 8.55.
2. **Current-stack re-measure**: tau over our own flagship learning run
   (the round-2 record predates the dot-form-Gram revert).
3. **Conditioned comparison**: our tau restricted to steps whose
   |xdot| and u^T B u lie inside the reference run's observed ranges —
   the regime-matched medians PARITY 2c asserts.

Run on the TPU (or CPU with JAX_PLATFORMS=cpu; the tau math is tiny).
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

REF_EVENTS = ("/root/reference/docs/saved-runs/"
              "unicycle_move_to_pose_fixed_learning_helps_avoid_getting_"
              "stuck_v1.6.3-1-g5fa08e8")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "records", "tpu_round3.jsonl")


def load_reference_channels():
    """Parse the reference's tensorboard events into per-step arrays."""
    import glob
    from tensorboard.backend.event_processing import event_file_loader
    from tensorboard.util import tensor_util
    f = sorted(glob.glob(os.path.join(REF_EVENTS, "events*")))[0]
    chans = {}
    for ev in event_file_loader.LegacyEventFileLoader(f).Load():
        for v in getattr(ev.summary, "value", []):
            if v.HasField("tensor"):
                arr = tensor_util.make_ndarray(v.tensor)
            elif v.HasField("simple_value"):
                arr = np.asarray(v.simple_value)
            else:
                continue
            chans.setdefault(v.tag, []).append((ev.step, arr))
    out = {}
    for tag, rows in chans.items():
        rows.sort(key=lambda r: r[0])
        try:
            out[tag] = np.stack([r[1] for r in rows])
        except ValueError:
            out[tag] = [r[1] for r in rows]
    return out


def stats(name, tau, Lfh, xvel, uBu):
    t, L = np.asarray(tau), np.asarray(Lfh)
    moving = np.asarray(xvel) > 1e-8
    return {
        "name": name, "n": int(moving.sum()),
        "tau_min": float(np.min(t[moving])),
        "tau_median": float(np.median(t[moving])),
        "tau_max": float(np.max(t[moving])),
        "Lfh_min": float(np.min(L[moving])),
        "Lfh_median": float(np.median(L[moving])),
        "Lfh_max": float(np.max(L[moving])),
        "xvel_range": [float(np.min(xvel[moving])),
                       float(np.median(xvel[moving])),
                       float(np.max(xvel[moving]))],
        "uBu_range": [float(np.min(uBu[moving])),
                      float(np.median(uBu[moving])),
                      float(np.max(uBu[moving]))],
    }


def main():
    from bayesian_cbf_tpu.observability.trigger import trigger_intervals
    from bayesian_cbf_tpu.experiments.montecarlo import (
        trigger_analysis_learning_run)
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim)
    t0 = time.time()

    # ---- 1. our math on the reference's own logged run -----------------
    ch = load_reference_channels()
    X = np.asarray(ch["vis/state"], np.float64)          # (200, 3)
    Xp = np.asarray(ch["vis/xtp1"], np.float64)
    U = np.asarray(ch["vis/uopt"], np.float64)
    ls = np.asarray(ch["vis/knl_lengthscale"], np.float64).reshape(
        X.shape[0], -1)
    sf = np.asarray(ch["vis/knl_scalefactor"], np.float64).reshape(-1)
    A = np.asarray(ch["vis/knl_A"], np.float64)
    B = np.asarray(ch["vis/knl_B"], np.float64)
    dt_ref = 0.01                       # trigger_interval.py:101 dt kwarg
    Xdot = (Xp - X) / dt_ref            # the reference's xvel definition

    # the reference's obstacle pair for this geometry (same start/goal
    # the events run used; trigger_interval.py:95-100)
    sim = make_ackermann_tracking_sim(numSteps=8, dt=0.01, max_train=8,
                                      training_iter=2)
    from bayesian_cbf_tpu.observability.trigger import per_step_cbf_grad_max
    f32 = jnp.float32
    # reference grid: Nte=1e3 -> Ndte = floor(1000^(1/3)) = 9 per axis
    gmax = per_step_cbf_grad_max(jnp.asarray(X, f32), sim.cbfs,
                                 grid_pts=9)
    tau, tau_num, Lfh, Lfh_num, xvel = trigger_intervals(
        jnp.asarray(X, f32), jnp.asarray(Xdot, f32), jnp.asarray(U, f32),
        jnp.asarray(sf, f32), jnp.asarray(ls, f32), jnp.asarray(A, f32),
        jnp.asarray(B, f32), gmax,
        jax.random.PRNGKey(0), grid_pts=9)
    ones = np.concatenate([np.ones((U.shape[0], 1)), U], 1)
    uBu_ref = np.einsum("ti,tij,tj->t", ones, B, ones)
    ref_same_inputs = stats("ours_on_reference_channels", tau, Lfh,
                            np.asarray(xvel), uBu_ref)

    # ---- 2. current-stack re-measure on our flagship learning run ------
    sim2, outs, st = trigger_analysis_learning_run(stride=10)
    knl = outs.knl
    T = outs.U.shape[0]
    onesT = np.concatenate([np.ones((T, 1)), np.asarray(outs.U)], 1)
    uBu_ours_full = np.einsum("ti,tij,tj->t", onesT,
                              np.asarray(knl.B), onesT)[::10]
    xvel_ours = np.linalg.norm(np.asarray(outs.Xdot)[::10], axis=-1)
    ours = stats("ours_current_stack", st["tau"], st["Lfh"],
                 xvel_ours, uBu_ours_full)

    # ---- 3. conditioned comparison -------------------------------------
    # the Eq.-11 bound is driven by the per-step learned amplitude
    # maxk = max_i A_ii * uBu * max_j sf^2/ls_j^2 (and by |xdot| in the
    # tau denominator); condition our steps on the reference run's
    # observed ranges of BOTH
    def step_amplitude(A_t, uBu_t, sf_t, ls_t):
        return (np.max(np.diagonal(A_t, axis1=-2, axis2=-1), -1)
                * uBu_t * np.max(sf_t[..., None] ** 2
                                 / ls_t ** 2, -1))

    amp_ref = step_amplitude(A, uBu_ref, sf, ls)
    knl_s = outs.knl
    sf_ours = np.sqrt(np.asarray(knl_s.outputscale))[::10]
    ls_ours = np.asarray(knl_s.lengthscale)[::10]
    A_ours = np.asarray(knl_s.A)[::10]
    amp_ours = step_amplitude(A_ours, uBu_ours_full, sf_ours, ls_ours)

    lo_v, hi_v = np.min(np.asarray(xvel)), np.max(np.asarray(xvel))
    lo_b, hi_b = uBu_ref.min(), uBu_ref.max()
    m = ((xvel_ours >= lo_v) & (xvel_ours <= hi_v)
         & (uBu_ours_full >= lo_b) & (uBu_ours_full <= hi_b)
         & (xvel_ours > 1e-8))
    m_amp = m & (amp_ours >= amp_ref.min()) & (amp_ours <= amp_ref.max())
    cond = {
        "name": "ours_conditioned_to_reference_regime",
        "n": int(m.sum()),
        "tau_median": (float(np.median(st["tau"][m])) if m.any() else None),
        "Lfh_median": (float(np.median(st["Lfh"][m])) if m.any() else None),
        "xvel_window": [float(lo_v), float(hi_v)],
        "uBu_window": [float(lo_b), float(hi_b)],
        "amp_windows": {"reference": [float(amp_ref.min()),
                                      float(np.median(amp_ref)),
                                      float(amp_ref.max())],
                        "ours": [float(amp_ours.min()),
                                 float(np.median(amp_ours)),
                                 float(amp_ours.max())]},
        "n_amp_matched": int(m_amp.sum()),
        "tau_median_amp_matched": (float(np.median(st["tau"][m_amp]))
                                   if m_amp.any() else None),
        "Lfh_median_amp_matched": (float(np.median(st["Lfh"][m_amp]))
                                   if m_amp.any() else None),
    }

    rec = {
        "item": "trigger_parity",
        "baseline": {"tau_range": [2.05e-4, 4.76e-4, 1.2e-3],
                     "Lfh_median": 8.55},
        "ours_on_reference_channels": ref_same_inputs,
        "ours_current_stack": ours,
        "conditioned": cond,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
