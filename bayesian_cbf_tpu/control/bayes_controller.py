"""L5 — the paper's main controller: probabilistic CLF tracking with
Bayes-CBF safety cones, solved as one small SOCP per step.

Parity target: ControllerCLFBayesian (unicycle_move_to_pose.py:801-998) and
the deterministic baseline ControllerCLF (:699-791).

TPU-first restructuring: the reference assembles numpy cones and calls
GUROBI per step (process boundary, SURVEY.md 3.1).  Here `bayes_clf_control`
is a pure jittable function state -> control:

  variables x = [u (m), relax, t]
  minimize  t
  s.t.  || W^(1/2) ([u; relax] - [u_ref; 0]) ||  <=  t          (objective cone)
        rho ||A_clc u + b_clc|| <= c_clc^T u + d_clc + relax    (CLC chance cone)
        rho ||A_k u + b_k||     <= c_k^T u + d_k                (CBC chance cones)

(The sqrt-epigraph has the same argmin as the reference's weighted
sum-of-squares objective since the objective is a pure norm.)
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
from .clf_cbf import CLFCartesian, ObstacleCBF


class BayesCLFControllerConfig(NamedTuple):
    """Static configuration (shapes/weights), matching the reference's
    ControllerCLFBayesian ctor defaults (unicycle_move_to_pose.py:805-820)."""
    u_dim: int = 2
    clf_gamma: float = 10.0
    cost_weights: Tuple[float, ...] = (0.33, 0.33, 0.33)
    ctrl_ref: Tuple[float, ...] = (0.0, 0.0)
    max_risk: float = 1e-2
    cbf_gammas: Tuple[float, ...] = ()
    socp_iters: int = 25

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
    clc_mean: jax.Array
    clc_var: jax.Array
    cbc_means: jax.Array
    cbc_vars: jax.Array


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


def bayes_clf_control(cfg: BayesCLFControllerConfig, clf, cbfs, planner,
                      fu_gp_fn, x, t):
    """One control step.  fu_gp_fn: u -> GP of F(x)^T[1;u] (from the learned
    dynamics).  Returns (u_opt, ControlInfo)."""
    m = cfg.u_dim
    x_dim = x.shape[-1]
    dtype = x.dtype
    state_goal = planner.plan(t)
    rho = jnp.asarray(cfg.rho, dtype)
    u0 = jnp.full((m,), 0.5, dtype)   # terms are exact; eval point arbitrary
    extravars = 2                      # [relax, t]
    nvar = m + extravars

    cones = []

    # objective epigraph cone
    w = jnp.sqrt(jnp.asarray(cfg.cost_weights, dtype))
    uref = jnp.asarray(cfg.ctrl_ref, dtype)
    A_obj = jnp.zeros((m + 1, nvar), dtype)
    A_obj = A_obj.at[:m, :m].set(jnp.diag(w[:m]))
    A_obj = A_obj.at[m, m].set(w[m])
    b_obj = jnp.concatenate([-w[:m] * uref, jnp.zeros((1,), dtype)])
    c_obj = jnp.zeros((nvar,), dtype).at[m + 1].set(1.0)
    cones.append((A_obj, b_obj, c_obj, jnp.zeros((), dtype)))

    # CLC cone (mean of the *negated* CLC must dominate rho * std - relax)
    clc_builder = lambda u: _clc_gp(cfg, clf, planner, fu_gp_fn, x_dim,
                                    state_goal, t, u) * (-1.0)
    (bfe, e), (V, bfv, v), clc_mean, clc_var = cbc2_quadratic_terms(
        clc_builder, x, u0)
    A, b, cvec, d = cbc_to_socp_cone(bfe, e, V, bfv, v,
                                     extravars=extravars, relax_col=0)
    cones.append((rho * A, rho * b, cvec, d))

    # CBC cones
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

    # assemble G, h
    Gs, hs, dims = [], [], []
    for (A, b, cvec, d) in cones:
        Gs.append(jnp.concatenate([-cvec[None, :], -A], 0))
        hs.append(jnp.concatenate([jnp.reshape(d, (1,)), b]))
        dims.append(A.shape[0] + 1)
    G = jnp.concatenate(Gs, 0)
    h = jnp.concatenate(hs, 0)
    cobj = jnp.zeros((nvar,), dtype).at[m + 1].set(1.0)

    sol = solve_socp(cobj, G, h, tuple(dims), iters=cfg.socp_iters)
    u_opt = sol.x[:m]
    info = ControlInfo(
        rho=rho, relax=sol.x[m], pcost=sol.pcost, pres=sol.pres,
        dres=sol.dres, clc_mean=clc_mean, clc_var=clc_var,
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
