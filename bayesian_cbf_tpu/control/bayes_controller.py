"""L5 — the paper's main controller: probabilistic CLF tracking with
Bayes-CBF safety cones, solved as one small SOCP per step.

Parity target: ControllerCLFBayesian (unicycle_move_to_pose.py:801-998) and
the deterministic baseline ControllerCLF (:699-791).

TPU-first restructuring (two layers):

1. The reference assembles each cone by autodiff-ing the GP expression
   tree once per term (mean affine pass + variance quadratic pass, each
   re-entering the GP posterior — SURVEY.md 3.1).  For relative-degree-1
   constraints the cones have a closed form in the *posterior moments*
       vec F(x) ~ N(vec FT^T, Bk kron A):
   for a linear functional w (grad V or grad h),
       mean  w^T F u_hom      = (w^T FT) u_hom            (affine in u)
       var   w^T F u_hom      = (u_hom^T Bk u_hom)(w^T A w)  (quadratic)
   so ONE posterior evaluation per step yields every cone:
       Asq_c = (w_c^T A w_c) * Bk   ==>  chol(Asq_c) = sqrt(s_c) chol(Bk).
   `bayes_clf_control` uses this fast path;
   `bayes_clf_control_gp` keeps the general GP-algebra path (used for
   cross-validation in tests and by rel-deg-2 constraints).

2. The per-step SOCP is solved by the jitted NT-scaled IPM with an
   in-graph infeasibility fallback to u_ref (the reference raises,
   optimizers.py:74-86 — impossible inside lax.scan, SURVEY.md 5.3).

  variables x = [u (m), relax, t]
  minimize  t
  s.t.  || W^(1/2) ([u; relax] - [u_ref; 0]) ||  <=  t          (objective)
        rho ||A_clc u + b_clc|| <= c_clc^T u + d_clc + relax    (CLC cone)
        rho ||A_k u + b_k||     <= c_k^T u + d_k                (CBC cones)
"""
from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..gp.algebra import DeterministicGP
from ..safety.cbc import (cbc1_safety_factor, cbc2_quadratic_terms,
                          cbc_to_socp_cone)
from ..solvers.socp import solve_socp
from ..utils.linalg import psd_cholesky, psd_chol_small_ladder
from .clf_cbf import CLFCartesian, ObstacleCBF


class BayesCLFControllerConfig(NamedTuple):
    """Static configuration, matching ControllerCLFBayesian ctor defaults
    (unicycle_move_to_pose.py:805-820)."""
    u_dim: int = 2
    clf_gamma: float = 10.0
    cost_weights: Tuple[float, ...] = (0.33, 0.33, 0.33)
    ctrl_ref: Tuple[float, ...] = (0.0, 0.0)
    max_risk: float = 1e-2
    cbf_gammas: Tuple[float, ...] = ()
    socp_iters: int = 25
    feas_tol: float = 1e-4
    # warm-started IPM across the rollout scan: carry the previous step's
    # (x, s, z) and run fewer Mehrotra iterations (the problem data moves
    # by O(dt) per step).  Enabled by the rollout layer when warm_start.
    warm_start: bool = False
    socp_iters_warm: int = 15

    @property
    def rho(self) -> float:
        """sqrt(2) erfinv(1 - 2 max_risk) (unicycle_move_to_pose.py:922-924)."""
        return cbc1_safety_factor(self.max_risk)


class ControlInfo(NamedTuple):
    rho: jax.Array
    relax: jax.Array
    pcost: jax.Array
    pres: jax.Array
    dres: jax.Array
    feasible: jax.Array
    clc_mean: jax.Array
    clc_var: jax.Array
    cbc_means: jax.Array
    cbc_vars: jax.Array


def warm_cone_count(cfg: BayesCLFControllerConfig, n_cbfs: int) -> int:
    """Number of cones in the bayes_clf_control SOCP (objective + CLC +
    CBCs) — the leading dim of the warm-start slack/dual blocks."""
    return 2 + n_cbfs


def warm_init(cfg: BayesCLFControllerConfig, n_cbfs: int, dtype):
    """Cold (x, S, Z) warm-start state for the first step of a scan;
    identical to the solver's own cold start."""
    nvar = cfg.u_dim + 2
    C = warm_cone_count(cfg, n_cbfs)
    dmax = cfg.u_dim + 2
    e = jnp.zeros((C, dmax), dtype).at[:, 0].set(1.0)
    return (jnp.zeros((nvar,), dtype), e, e)


def constraint_cone_terms(cfg: BayesCLFControllerConfig, clf, cbfs,
                          planner, moments, x, t):
    """The affine/quadratic pieces of the CLC + CBC chance cones.

    Shared by `bayes_clf_control` (which assembles them into the SOCP)
    and `chance_constraint_margins` (the post-hoc audit of realized
    margins at applied controls), so the two can never drift.  Parity:
    the cone semantics of bayes_cbf/unicycle_move_to_pose.py:880-922.

    Returns (sgn, const, m_aff, s, LbT): row 0 is the CLC (sign -1,
    gets the relax slack in the SOCP), rows 1..C the CBCs."""
    dtype = x.dtype
    FT, Bk, A = moments
    # (1+m) x (1+m) posterior row covariance: unrolled factorization —
    # the laddered XLA cholesky here was a per-step latency-bound
    # custom call in the rollout scan (round-3 profiler trace)
    Lb = psd_chol_small_ladder(Bk, init_jitter=1e-10)
    LbT = Lb.T                                    # (1+m, 1+m)

    state_goal = planner.plan(t)
    # linear functionals and additive constants per constraint
    gclf = clf.grad_clf(x, state_goal)
    consts = [cfg.clf_gamma * clf.clf(x, state_goal)
              + clf.grad_clf_wrt_goal(x, state_goal) @ planner.dot_plan(t)]
    ws = [gclf]
    signs = [-1.0]                               # CLC enters negated
    for cbf, gamma in zip(cbfs, cfg.cbf_gammas):
        ws.append(cbf.grad_cbf(x))
        consts.append(gamma * cbf.cbf(x))
        signs.append(1.0)
    W = jnp.stack(ws)                            # (C, n)
    sgn = jnp.asarray(signs, dtype)
    const = jnp.stack([jnp.reshape(c, ()) for c in consts])

    m_aff = W @ FT                               # (C, 1+m): [const, u-coefs]
    s = jnp.einsum('ci,ij,cj->c', W, A, W)       # (C,) variance scale
    return sgn, const, m_aff, s, LbT


def chance_constraint_margins(cfg: BayesCLFControllerConfig, clf, cbfs,
                              planner, moments, x, t, u):
    """Realized chance-constraint margins at an APPLIED control u.

    margin_c = sgn_c (m_aff_c [1; u] + const_c)
               - rho sqrt(s_c) || LbT[:, 1:] u + LbT[:, 0] ||

    i.e. the amount by which the probabilistic constraint holds at u
    (>= 0 means Pr[violation] <= max_risk under the posterior).  Row 0
    is the CLC WITHOUT its relax slack — it may legitimately go
    negative; rows 1.. are the CBCs, which the audit gates.  This is
    the cross-check that the f32 feasibility gate (feas_tol ~5e-3
    relative primal residual) never admits a control that actually
    violates a safety cone (round-2 review weak item 9)."""
    sgn, const, m_aff, s, LbT = constraint_cone_terms(
        cfg, clf, cbfs, planner, moments, x, t)
    rho = jnp.asarray(cfg.rho, x.dtype)
    lin = sgn * (m_aff[:, 0] + m_aff[:, 1:] @ u + const)
    nv = LbT[:, 1:] @ u + LbT[:, 0]
    return lin - rho * jnp.sqrt(jnp.maximum(s, 0.0)) * jnp.linalg.norm(nv)


def bayes_clf_control(cfg: BayesCLFControllerConfig, clf, cbfs, planner,
                      moments_fn, x, t, warm=None):
    """One control step via closed-form cones.

    moments_fn: x -> (FT (n, 1+m), Bk (1+m, 1+m), A (n, n)) posterior
    moments of the learned dynamics.  Returns (u_opt, ControlInfo); with
    `warm` (previous step's (x, s, z)) returns (u_opt, ControlInfo,
    warm_next) and runs the reduced cfg.socp_iters_warm iteration count."""
    m = cfg.u_dim
    dtype = x.dtype
    rho = jnp.asarray(cfg.rho, dtype)
    extravars = 2
    nvar = m + extravars

    mom = moments_fn(x)
    Bk = mom[1]
    sgn, const, m_aff, s, LbT = constraint_cone_terms(
        cfg, clf, cbfs, planner, mom, x, t)
    sqrt_s = jnp.sqrt(jnp.maximum(s, 0.0))

    ncon = sgn.shape[0]
    # a near-zero safety factor (max_risk -> 0.5, the "mean CBF" setting)
    # degenerates the SOCs to half-spaces; emitting them as linear 1-dim
    # cones keeps the NT scaling well-conditioned (f32 fast path)
    mean_only = cfg.rho < 1e-3
    # cone norm part: rho * sqrt(s_c) * || LbT[:,1:] u + LbT[:,0] ||
    A_norm = jnp.zeros((ncon, m + 1, nvar), dtype)
    A_norm = A_norm.at[:, :, :m].set(
        rho * sqrt_s[:, None, None] * LbT[None, :, 1:])
    b_norm = rho * sqrt_s[:, None] * LbT[None, :, 0]
    # linear part: sgn*(m_aff u + const-part), CLC gets +relax
    bfc = jnp.zeros((ncon, nvar), dtype)
    bfc = bfc.at[:, :m].set(sgn[:, None] * m_aff[:, 1:])
    bfc = bfc.at[0, m].set(1.0)                  # relax on the CLC row
    d = sgn * (m_aff[:, 0] + const)

    # objective epigraph cone
    wcost = jnp.sqrt(jnp.asarray(cfg.cost_weights, dtype))
    uref = jnp.asarray(cfg.ctrl_ref, dtype)
    A_obj = jnp.zeros((m + 1, nvar), dtype)
    A_obj = A_obj.at[:m, :m].set(jnp.diag(wcost[:m]))
    A_obj = A_obj.at[m, m].set(wcost[m])
    b_obj = jnp.concatenate([-wcost[:m] * uref, jnp.zeros((1,), dtype)])
    c_obj = jnp.zeros((nvar,), dtype).at[m + 1].set(1.0)

    # assemble G, h: objective cone + C constraint cones
    G_rows = [jnp.concatenate([-c_obj[None, :], -A_obj], 0)]
    h_rows = [jnp.concatenate([jnp.zeros((1,), dtype), b_obj])]
    dims = [m + 2]
    for ci in range(ncon):
        if mean_only:
            G_rows.append(-bfc[ci][None, :])
            h_rows.append(jnp.reshape(d[ci], (1,)))
            dims.append(1)
        else:
            G_rows.append(jnp.concatenate([-bfc[ci][None, :],
                                           -A_norm[ci]], 0))
            h_rows.append(jnp.concatenate([jnp.reshape(d[ci], (1,)),
                                           b_norm[ci]]))
            dims.append(m + 2)
    G = jnp.concatenate(G_rows, 0)
    h = jnp.concatenate(h_rows, 0)
    dims = tuple(dims)
    cobj = jnp.zeros((nvar,), dtype).at[m + 1].set(1.0)

    # mean-only (near-0.5-risk) problems are tiny LPs where warm-started
    # reduced-iteration solves measurably hurt f32 feasibility (TPU diag,
    # round 2) and save nothing — solve those cold at full iterations
    use_warm = None if mean_only else warm
    iters = cfg.socp_iters if use_warm is None else cfg.socp_iters_warm
    sol = solve_socp(cobj, G, h, dims, iters=iters, warm=use_warm)
    # dtype-aware feasibility gate: the f32 IPM plateaus near 1e-4 relative
    # primal residual on well-posed problems; gating it at the f64 tolerance
    # would spuriously reject ~half the steps
    feas_tol = cfg.feas_tol if dtype == jnp.float64 else max(cfg.feas_tol,
                                                             5e-3)
    feasible = (sol.pres < feas_tol) & jnp.all(jnp.isfinite(sol.x))
    u_opt = jnp.where(feasible, sol.x[:m], jnp.broadcast_to(uref, (m,)))

    clc_mean = sgn[0] * (m_aff[0, 0] + const[0])   # at u = 0
    clc_var = s[0] * Bk[0, 0]
    info = ControlInfo(
        rho=rho, relax=sol.x[m], pcost=sol.pcost, pres=sol.pres,
        dres=sol.dres, feasible=feasible,
        clc_mean=clc_mean, clc_var=clc_var,
        cbc_means=(m_aff[1:, 0] + const[1:]),
        cbc_vars=(s[1:] * Bk[0, 0]))
    if warm is None:
        return u_opt, info
    return u_opt, info, (sol.x, sol.s, sol.z)


# ---------------------------------------------------------------------------
# general GP-algebra path (kept for cross-validation and rel-deg-2 reuse)
# ---------------------------------------------------------------------------

def _clc_gp(cfg, clf, planner, fu_gp_fn, x_dim, state_goal, t, u):
    """CLC GP: grad_V^T (Fu)_gp + grad_goal_V^T xdot_plan + gamma V
    (unicycle_move_to_pose.py:880-888)."""
    clfgp = DeterministicGP(
        lambda x: jnp.reshape(cfg.clf_gamma * clf.clf(x, state_goal), (1,)),
        dim=1, name="gammaV")
    gclf = DeterministicGP(lambda x: clf.grad_clf(x, state_goal),
                           dim=x_dim, name="gradV")
    gclf_goal = DeterministicGP(lambda x: clf.grad_clf_wrt_goal(x, state_goal),
                                dim=x_dim, name="gradV_goal")
    dplan = DeterministicGP(lambda x: planner.dot_plan(t), dim=x_dim,
                            name="dot_plan")
    return gclf.t() @ fu_gp_fn(u) + gclf_goal.t() @ dplan + clfgp


def _cbc_gp(cbf: ObstacleCBF, gamma, fu_gp_fn, x_dim, u):
    """Relative-degree-1 CBC with stochastic F: grad_h^T (Fu)_gp + gamma h
    (unicycle_move_to_pose.py:901-906)."""
    hgp = DeterministicGP(lambda x: jnp.reshape(gamma * cbf.cbf(x), (1,)),
                          dim=1, name="gamma_h")
    ghgp = DeterministicGP(cbf.grad_cbf, dim=x_dim, name="grad_h")
    return ghgp.t() @ fu_gp_fn(u) + hgp


def bayes_clf_control_gp(cfg: BayesCLFControllerConfig, clf, cbfs, planner,
                         fu_gp_fn, x, t):
    """GP-expression-tree variant (the reference's computation route);
    slower but fully general.  Used to validate the closed-form path."""
    m = cfg.u_dim
    x_dim = x.shape[-1]
    dtype = x.dtype
    state_goal = planner.plan(t)
    rho = jnp.asarray(cfg.rho, dtype)
    u0 = jnp.full((m,), 0.5, dtype)
    extravars = 2
    nvar = m + extravars

    cones = []
    wcost = jnp.sqrt(jnp.asarray(cfg.cost_weights, dtype))
    uref = jnp.asarray(cfg.ctrl_ref, dtype)
    A_obj = jnp.zeros((m + 1, nvar), dtype)
    A_obj = A_obj.at[:m, :m].set(jnp.diag(wcost[:m]))
    A_obj = A_obj.at[m, m].set(wcost[m])
    b_obj = jnp.concatenate([-wcost[:m] * uref, jnp.zeros((1,), dtype)])
    c_obj = jnp.zeros((nvar,), dtype).at[m + 1].set(1.0)
    cones.append((A_obj, b_obj, c_obj, jnp.zeros((), dtype)))

    clc_builder = lambda u: _clc_gp(cfg, clf, planner, fu_gp_fn, x_dim,
                                    state_goal, t, u) * (-1.0)
    (bfe, e), (V, bfv, v), clc_mean, clc_var = cbc2_quadratic_terms(
        clc_builder, x, u0)
    A, b, cvec, d = cbc_to_socp_cone(bfe, e, V, bfv, v,
                                     extravars=extravars, relax_col=0)
    cones.append((rho * A, rho * b, cvec, d))

    cbc_means, cbc_vars = [], []
    for cbf, gamma in zip(cbfs, cfg.cbf_gammas):
        cbc_builder = lambda u, cbf=cbf, gamma=gamma: _cbc_gp(
            cbf, gamma, fu_gp_fn, x_dim, u)
        (bfe, e), (V, bfv, v), mu_k, var_k = cbc2_quadratic_terms(
            cbc_builder, x, u0)
        A, b, cvec, d = cbc_to_socp_cone(bfe, e, V, bfv, v,
                                         extravars=extravars, relax_col=-1)
        cones.append((rho * A, rho * b, cvec, d))
        cbc_means.append(mu_k)
        cbc_vars.append(var_k)

    Gs, hs, dims = [], [], []
    for (A, b, cvec, d) in cones:
        Gs.append(jnp.concatenate([-cvec[None, :], -A], 0))
        hs.append(jnp.concatenate([jnp.reshape(d, (1,)), b]))
        dims.append(A.shape[0] + 1)
    G = jnp.concatenate(Gs, 0)
    h = jnp.concatenate(hs, 0)
    cobj = jnp.zeros((nvar,), dtype).at[m + 1].set(1.0)

    sol = solve_socp(cobj, G, h, tuple(dims), iters=cfg.socp_iters)
    feas_tol = cfg.feas_tol if dtype == jnp.float64 else max(cfg.feas_tol,
                                                             5e-3)
    feasible = (sol.pres < feas_tol) & jnp.all(jnp.isfinite(sol.x))
    u_opt = jnp.where(feasible, sol.x[:m], jnp.broadcast_to(uref, (m,)))
    info = ControlInfo(
        rho=rho, relax=sol.x[m], pcost=sol.pcost, pres=sol.pres,
        dres=sol.dres, feasible=feasible,
        clc_mean=clc_mean, clc_var=clc_var,
        cbc_means=(jnp.stack(cbc_means) if cbc_means
                   else jnp.zeros((0,), dtype)),
        cbc_vars=(jnp.stack(cbc_vars) if cbc_vars
                  else jnp.zeros((0,), dtype)))
    return u_opt, info


class MeanCLFControllerConfig(NamedTuple):
    """Deterministic mean-CLF/CBF QP baseline (ControllerCLF,
    unicycle_move_to_pose.py:699-791)."""
    u_dim: int = 2
    clf_gamma: float = 10.0
    clf_relax_weight: float = 10.0
    cbf_gammas: Tuple[float, ...] = ()
    ctrl_lo: Tuple[float, ...] = (-10.0, -math.pi * 5)
    ctrl_hi: Tuple[float, ...] = (10.0, math.pi * 5)
    socp_iters: int = 25


def mean_clf_control(cfg: MeanCLFControllerConfig, clf, cbfs, planner,
                     f_func, g_func, x, t):
    """min ||u||^2 + w_relax * relax  s.t.  CLC <= relax, CBC_k >= 0, box.

    Solved as an SOCP with a rotated-cone epigraph on ||u||^2:
    variables [u, relax, t]; u^T u <= t  <=>  ||[2u; t-1]|| <= t+1."""
    m = cfg.u_dim
    dtype = x.dtype
    nvar = m + 2
    state_goal = planner.plan(t)

    fx = f_func(x)
    gx = g_func(x)
    gclf = clf.grad_clf(x, state_goal)
    gclf_goal = clf.grad_clf_wrt_goal(x, state_goal)
    clc_a = gclf @ gx
    clc_b = (gclf @ fx + gclf_goal @ planner.dot_plan(t)
             + cfg.clf_gamma * clf.clf(x, state_goal))

    cobj = jnp.zeros((nvar,), dtype)
    cobj = cobj.at[m].set(cfg.clf_relax_weight).at[m + 1].set(1.0)

    Gs, hs, dims = [], [], []
    # rotated cone ||[2u; t-1]|| <= t+1
    A = jnp.zeros((m + 1, nvar), dtype)
    A = A.at[:m, :m].set(2.0 * jnp.eye(m, dtype=dtype)).at[m, m + 1].set(1.0)
    b = jnp.zeros((m + 1,), dtype).at[m].set(-1.0)
    cvec = jnp.zeros((nvar,), dtype).at[m + 1].set(1.0)
    Gs.append(jnp.concatenate([-cvec[None, :], -A], 0))
    hs.append(jnp.concatenate([jnp.ones((1,), dtype), b]))
    dims.append(m + 2)

    def lin_cone(coef, const):
        Gs.append(-coef[None, :])
        hs.append(jnp.reshape(const, (1,)))
        dims.append(1)

    # CLC: relax - clc_a u - clc_b >= 0
    coef = jnp.zeros((nvar,), dtype).at[:m].set(-clc_a).at[m].set(1.0)
    lin_cone(coef, -clc_b)
    # CBCs: gcbf (f + g u) + gamma h >= 0
    for cbf, gamma in zip(cbfs, cfg.cbf_gammas):
        gh = cbf.grad_cbf(x)
        coef = jnp.zeros((nvar,), dtype).at[:m].set(gh @ gx)
        lin_cone(coef, gh @ fx + gamma * cbf.cbf(x))
    # box bounds
    lo = jnp.asarray(cfg.ctrl_lo, dtype)
    hi = jnp.asarray(cfg.ctrl_hi, dtype)
    for i in range(m):
        ei = jnp.zeros((nvar,), dtype).at[i].set(1.0)
        lin_cone(ei, -lo[i])
        lin_cone(-ei, hi[i])

    G = jnp.concatenate(Gs, 0)
    h = jnp.concatenate(hs, 0)
    sol = solve_socp(cobj, G, h, tuple(dims), iters=cfg.socp_iters)
    return sol.x[:m], sol
