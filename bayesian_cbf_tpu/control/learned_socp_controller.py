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
    extravars = 2                    # [delta, y]
    nvar = m + extravars
    u0 = jnp.full((m,), 0.5, dtype)
    factor = jnp.asarray(cfg.safety_factor, dtype)

    hs = cbf_h if isinstance(cbf_h, (list, tuple)) else (cbf_h,)
    ghs = (cbf_grad_h if isinstance(cbf_grad_h, (list, tuple))
           else (cbf_grad_h,))

    Gs, hs_out, dims = [], [], []

    def add_cone(A, b, cvec, d):
        Gs.append(jnp.concatenate([-cvec[None, :], -A], 0))
        hs_out.append(jnp.concatenate([jnp.reshape(d, (1,)), b]))
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

    # CBC2 safety cones: factor * ||A u + b|| <= c^T u + d  (no delta)
    cbc_means, cbc_vars = [], []
    mder = None if moment_deriv_fn is None else moment_deriv_fn(x)
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
                                         extravars=extravars, relax_col=-1)
        add_cone(factor * A, factor * b, cvec, d)
        cbc_means.append(mu_k)
        cbc_vars.append(var_k)

    # optional relaxed stability cone: ||A u + b|| <= c^T u + delta + d
    if clc_fn is not None:
        (bfe, e), (V, bfv, v), _, _ = cbc2_quadratic_terms(clc_fn, x, u0)
        A, b, cvec, d = cbc_to_socp_cone(bfe, e, V, bfv, v,
                                         extravars=extravars, relax_col=0)
        add_cone(A, b, cvec, d)

    G = jnp.concatenate(Gs, 0)
    hh = jnp.concatenate(hs_out, 0)
    cobj = jnp.zeros((nvar,), dtype).at[m + 1].set(1.0)
    sol = solve_socp(cobj, G, hh, tuple(dims), iters=cfg.socp_iters)
    # in-graph infeasibility fallback: keep the reference control
    # (the reference raises InfeasibleProblemError and restores u_ref,
    # controllers.py:577-583 — raising is impossible inside lax.scan)
    feas_tol = 1e-4 if dtype == jnp.float64 else 5e-3
    feasible = (sol.pres < feas_tol) & jnp.all(jnp.isfinite(sol.x))
    u_fb = u_ref if u_fallback is None else u_fallback
    u = jnp.where(feasible, sol.x[:m], u_fb)
    info = dict(delta=sol.x[m], pres=sol.pres, dres=sol.dres,
                feasible=feasible,
                cbc_mean=jnp.stack(cbc_means), cbc_var=jnp.stack(cbc_vars))
    return u, info
