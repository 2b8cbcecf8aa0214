"""L5 — SOCP/QP controller over *learned* rel-deg-2 CBCs (pendulum stack).

Parity: SOCPController / QPController / ControlCBFLearned
(bayes_cbf/controllers.py:382-736) — the epsilon-greedy LQR reference
control, the epigraph objective cone ||[sqrt(lam) delta; sqrt(Q)(u-u_ref)]||
<= y (controllers.py:396-420), CBC2 safety cones built through GradientGP
of the GP posterior (the numerically hardest path, SURVEY.md 3.4), and an
optional relaxed stability cone.

Variable layout here: x = [u (m), delta, y]  (extras last; the reference
puts them first — pure reindexing)."""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..safety.cbc import (cbc2_closed_form_terms, cbc2_gp,
                          cbc2_quadratic_terms, cbc2_safety_factor,
                          cbc_to_socp_cone)
from ..solvers.socp import solve_socp


class LearnedSOCPControllerConfig(NamedTuple):
    """ControlCBFLearned-equivalent wiring (controllers.py:665-736)."""
    u_dim: int = 1
    x_dim: int = 2
    ctrl_reg: float = 1.0            # Q (control effort weight)
    clf_relax_weight: float = 100.0  # lambda (delta penalty)
    max_unsafe_prob: float = 0.01
    k_alpha: Tuple[float, float] = (1.0, 3.0)
    socp_iters: int = 25
    # assemble CBC2 cones from one posterior moment-derivative evaluation
    # (cbc2_closed_form_terms) instead of the per-cone GradientGP walk
    closed_form: bool = True
    # include the raw cone data (G, h) and u_ref in the per-step info —
    # the feasibility-forensics capture path (round-4 verdict 1); off for
    # production scans (it stores ~(sum dims x nvar) extra per step)
    debug_cones: bool = False
    # Certified best-effort relaxation of the CBC cones (round-5
    # feasibility forensics): the Cantelli cone rho*||Au+b|| <= c^T u + d
    # is GENUINELY unsatisfiable for any u when the posterior is wide
    # (measured: 100% of infeasible flagship steps, min-violation 14-42;
    # records pendulum_feasibility_forensics).  The reference never hits
    # this because its runnable pendulum path (ControlCBFLearned default
    # controller_class=QPController, controllers.py:695) enforces only
    # the mean CLC — no CBC cone at all.  Rather than weaken to that, we
    # add slack s >= 0 to each CBC cone with exact-penalty weight
    # cbc_relax_weight in the objective: feasible steps are unchanged
    # (s -> 0), unsatisfiable steps execute the MAX-SAFETY control
    # (min-violation u) instead of an uncertified fallback.  A step is
    # `certified` iff its slack is ~0.
    cbc_relax: bool = True
    cbc_relax_weight: float = 100.0

    @property
    def safety_factor(self) -> float:
        return cbc2_safety_factor(self.max_unsafe_prob)


def learned_socp_control(cfg: LearnedSOCPControllerConfig,
                         cbf_h, cbf_grad_h,
                         f_gp_fn: Callable, fu_gp_fn: Callable,
                         u_ref, x, clc_fn: Optional[Callable] = None,
                         moment_deriv_fn: Optional[Callable] = None,
                         u_fallback=None):
    """One SOCP step with learned CBC2 cones.

    cbf_h / cbf_grad_h: barrier and its gradient (can be lists for multiple
    barriers — pass tuples).  f_gp_fn() / fu_gp_fn(u) provide the learned
    model GPs with registered cross-covariance.  clc_fn: optional
    u -> GP of the (negated) CLC for the stability cone.

    moment_deriv_fn (optional): x -> posterior moment derivatives
    (LearnedShiftInvariantDynamics.moment_derivatives).  When given, the
    CBC2 cones are assembled in closed form from ONE posterior-derivative
    evaluation (cbc2_closed_form_terms) instead of walking GradientGP
    Hessians through the posterior once per cone — the fast path for
    rollout scans (same u->cone math, cross-checked in
    tests/test_pendulum_exp.py).

    u_fallback (optional): the control executed on an infeasible step.
    Defaults to u_ref, but when u_ref carries exploration noise (the
    epsilon-greedy wrapper) callers MUST pass the clean unperturbed
    reference here — an uncertified step should execute the safe
    reference control, never exploration noise.  The reference restores
    the pre-perturbation u_ref on failure (controllers.py:577-583)."""
    m = cfg.u_dim
    dtype = x.dtype
    # variable layout: [u (m), delta, y] (+ CBC slack s when cbc_relax)
    extravars = 3 if cfg.cbc_relax else 2
    nvar = m + extravars
    u0 = jnp.full((m,), 0.5, dtype)
    factor = jnp.asarray(cfg.safety_factor, dtype)

    hs = cbf_h if isinstance(cbf_h, (list, tuple)) else (cbf_h,)
    ghs = (cbf_grad_h if isinstance(cbf_grad_h, (list, tuple))
           else (cbf_grad_h,))

    Gs, hs_out, dims = [], [], []

    def add_cone(A, b, cvec, d, normalize=False):
        Gk = jnp.concatenate([-cvec[None, :], -A], 0)
        hk = jnp.concatenate([jnp.reshape(d, (1,)), b])
        if normalize:
            # scale the whole cone by 1/max|entry|: identical feasible
            # set, but keeps the IPM's NT scaling well-conditioned when
            # a wide posterior makes the CBC coefficients O(10-100)
            # (f32 stall class, round-5 feasibility forensics)
            s = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(Gk)),
                                        jnp.max(jnp.abs(hk))),
                            jnp.asarray(1.0, dtype))
            Gk, hk = Gk / s, hk / s
        Gs.append(Gk)
        hs_out.append(hk)
        dims.append(A.shape[0] + 1)

    # objective: || [sqrt(Q)(u - u_ref); sqrt(lam) delta] || <= y
    sq = math.sqrt(cfg.ctrl_reg)
    sl = math.sqrt(cfg.clf_relax_weight)
    A_obj = jnp.zeros((m + 1, nvar), dtype)
    A_obj = A_obj.at[:m, :m].set(sq * jnp.eye(m, dtype=dtype))
    A_obj = A_obj.at[m, m].set(sl)
    b_obj = jnp.concatenate([-sq * u_ref, jnp.zeros((1,), dtype)])
    c_obj = jnp.zeros((nvar,), dtype).at[m + 1].set(1.0)
    add_cone(A_obj, b_obj, c_obj, jnp.zeros((), dtype))

    # CBC2 safety cones: factor * ||A u + b|| <= c^T u (+ s) + d
    # (cbc_relax: shared slack s in the last column, exact-penalized)
    cbc_means, cbc_vars = [], []
    mder = None if moment_deriv_fn is None else moment_deriv_fn(x)
    cbc_relax_col = 2 if cfg.cbc_relax else -1
    for h, gh in zip(hs, ghs):
        if mder is not None:
            (bfe, e), (V, bfv, v), mu_k, var_k = cbc2_closed_form_terms(
                h, gh, cfg.k_alpha, mder, x, u0)
        else:
            builder = lambda uu, h=h, gh=gh: cbc2_gp(
                h, gh, f_gp_fn, fu_gp_fn, cfg.x_dim, cfg.k_alpha, uu)
            (bfe, e), (V, bfv, v), mu_k, var_k = cbc2_quadratic_terms(
                builder, x, u0)
        A, b, cvec, d = cbc_to_socp_cone(bfe, e, V, bfv, v,
                                         extravars=extravars,
                                         relax_col=cbc_relax_col)
        add_cone(factor * A, factor * b, cvec, d, normalize=True)
        cbc_means.append(mu_k)
        cbc_vars.append(var_k)
    if cfg.cbc_relax:
        # s >= 0 as a 1-dim cone row
        e_s = jnp.zeros((nvar,), dtype).at[m + 2].set(1.0)
        Gs.append(-e_s[None, :])
        hs_out.append(jnp.zeros((1,), dtype))
        dims.append(1)

    # optional relaxed stability cone: ||A u + b|| <= c^T u + delta + d
    if clc_fn is not None:
        (bfe, e), (V, bfv, v), _, _ = cbc2_quadratic_terms(clc_fn, x, u0)
        A, b, cvec, d = cbc_to_socp_cone(bfe, e, V, bfv, v,
                                         extravars=extravars, relax_col=0)
        add_cone(A, b, cvec, d)

    G = jnp.concatenate(Gs, 0)
    hh = jnp.concatenate(hs_out, 0)
    cobj = jnp.zeros((nvar,), dtype).at[m + 1].set(1.0)
    if cfg.cbc_relax:
        cobj = cobj.at[m + 2].set(cfg.cbc_relax_weight)
    sol = solve_socp(cobj, G, hh, tuple(dims), iters=cfg.socp_iters)
    # in-graph infeasibility fallback: keep the reference control
    # (the reference raises InfeasibleProblemError and restores u_ref,
    # controllers.py:577-583 — raising is impossible inside lax.scan).
    # With cbc_relax the program is always strictly feasible, so this
    # only triggers on outright solver failure.
    feas_tol = 1e-4 if dtype == jnp.float64 else 5e-3
    feasible = (sol.pres < feas_tol) & jnp.all(jnp.isfinite(sol.x))
    u_fb = u_ref if u_fallback is None else u_fallback
    u = jnp.where(feasible, sol.x[:m], u_fb)
    info = dict(delta=sol.x[m], pres=sol.pres, dres=sol.dres,
                feasible=feasible,
                cbc_mean=jnp.stack(cbc_means), cbc_var=jnp.stack(cbc_vars))
    if cfg.cbc_relax:
        # `certified`: the hard chance constraint held (slack ~ 0 in CBC
        # mean units).  slack > tol marks a best-effort (max-safety) step.
        slack = sol.x[m + 2]
        slack_tol = 1e-6 if dtype == jnp.float64 else 1e-2
        info["cbc_slack"] = slack
        info["certified"] = feasible & (slack < slack_tol)
    else:
        info["certified"] = feasible
    if cfg.debug_cones:
        info.update(G=G, h=hh, u_ref=u_ref, x_sol=sol.x)
    return u, info
