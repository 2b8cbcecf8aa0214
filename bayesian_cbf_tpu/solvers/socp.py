"""L6 — jitted second-order-cone programming.

Replaces the reference's out-of-graph GUROBI / cvxopt solvers
(bayes_cbf/optimizers.py:6-116) — the per-step CPU round trip that
dominated the reference's control-loop wall time (SURVEY.md section 3.1) —
with a pure-JAX Nesterov-Todd primal-dual interior-point method:

    minimize    c^T x
    subject to  G x + s = h,   s in K = Q_{d_1} x ... x Q_{d_M}

where Q_d = { (s0, s1) : s0 >= ||s1||_2 } is the second-order cone of
dimension d (d = 1 degenerates to the nonnegative orthant, so linear
inequalities are 1-dim cones).

Design notes (TPU-first):
  * cone layout `dims` is a static tuple -> the per-cone loop unrolls at
    trace time into fused dense algebra; every iteration is a handful of
    tiny matmuls that XLA keeps in registers/VMEM;
  * fixed iteration count, `where`-guarded numerics (no data-dependent
    control flow) -> fully jittable and vmappable: thousands of SOCPs
    solve in parallel as one batched kernel, which is what makes the
    >=10k control-steps/sec target possible (BASELINE.md north-star);
  * infeasibility cannot raise inside a scan (the reference raises
    InfeasibleProblemError, optimizers.py:74-86); instead the solution
    carries residual diagnostics so callers can apply an in-graph
    fallback (SURVEY.md section 5.3).

Algorithm: standard Mehrotra predictor-corrector conelp with NT scaling
(Vandenberghe, "The CVXOPT linear and quadratic cone program solvers";
Alizadeh & Goldfarb 2003).  For each SOC with J = diag(1, -I):
    sbar = s / sqrt(s^T J s),  zbar = z / sqrt(z^T J z),
    gamma^2 = (1 + sbar^T zbar) / 2,
    wbar = (sbar + J zbar) / (2 gamma),      (wbar^T J wbar = 1)
    eta  = (s^T J s / z^T J z)^{1/4},
    W^2  = eta^2 (2 wbar wbar^T - J),  W^{-2} = eta^{-2} (2 (J wbar)(J wbar)^T - J).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-14


class SOCPSolution(NamedTuple):
    x: jax.Array
    s: jax.Array
    z: jax.Array
    pres: jax.Array       # primal residual |Gx+s-h| / max(1,|h|)
    dres: jax.Array       # dual residual |c+G^T z| / max(1,|c|)
    gap: jax.Array        # complementarity s^T z / nu
    pcost: jax.Array      # c^T x


def _split(v, dims):
    out, i = [], 0
    for d in dims:
        out.append(v[i:i + d])
        i += d
    return out


def _jdot(u):
    """u^T J u = u0^2 - |u1|^2 for one cone block."""
    return u[0] * u[0] - jnp.sum(u[1:] * u[1:])


def _jordan_mul(u, v):
    """SOC Jordan product: u o v = (u^T v, u0 v1 + v0 u1)."""
    head = jnp.sum(u * v)
    tail = u[0] * v[1:] + v[0] * u[1:]
    return jnp.concatenate([head[None], tail])


def _jordan_inv_mul(lmbda, v):
    """Solve lmbda o u = v for u."""
    det = _jdot(lmbda)
    det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    l0 = jnp.where(jnp.abs(lmbda[0]) < _EPS, _EPS, lmbda[0])
    u0 = (lmbda[0] * v[0] - jnp.sum(lmbda[1:] * v[1:])) / det
    u1 = (v[1:] - u0 * lmbda[1:]) / l0
    return jnp.concatenate([u0[None], u1])


def _unit_e(d, dtype):
    return jnp.concatenate([jnp.ones((1,), dtype), jnp.zeros((d - 1,), dtype)])


def _nt_scaling(s, z):
    """Per-cone NT scaling: returns (wbar, eta) with W = eta * Wbar."""
    ss = jnp.sqrt(jnp.maximum(_jdot(s), _EPS))
    zz = jnp.sqrt(jnp.maximum(_jdot(z), _EPS))
    sbar, zbar = s / ss, z / zz
    gamma = jnp.sqrt(jnp.maximum((1.0 + jnp.sum(sbar * zbar)) * 0.5, _EPS))
    Jzbar = jnp.concatenate([zbar[:1], -zbar[1:]])
    wbar = (sbar + Jzbar) / (2.0 * gamma)
    eta = jnp.sqrt(ss / zz)
    return wbar, eta


def _w_mul(wbar, eta, v):
    """W v = eta * Wbar v, Wbar = [[w0, w1^T],[w1, I + w1 w1^T/(1+w0)]]."""
    w0, w1 = wbar[0], wbar[1:]
    head = w0 * v[0] + jnp.sum(w1 * v[1:])
    tail = v[0] * w1 + v[1:] + w1 * (jnp.sum(w1 * v[1:]) / (1.0 + w0))
    return eta * jnp.concatenate([head[None], tail])


def _winv_mul(wbar, eta, v):
    """W^{-1} v; Wbar^{-1} = J Wbar J."""
    Jv = jnp.concatenate([v[:1], -v[1:]])
    u = _w_mul(wbar, 1.0, Jv)
    Ju = jnp.concatenate([u[:1], -u[1:]])
    return Ju / eta


def _winv2_mul(wbar, eta, v):
    """W^{-2} v = eta^{-2} (2 (J wbar)(J wbar)^T - J) v."""
    Jw = jnp.concatenate([wbar[:1], -wbar[1:]])
    Jv = jnp.concatenate([v[:1], -v[1:]])
    return (2.0 * Jw * jnp.sum(Jw * v) - Jv) / (eta * eta)


def _max_step(p, dp):
    """Largest t in [0, BIG] with p + t dp in the SOC (p strictly inside).

    Solves the boundary quadratic a t^2 + b t + c = 0 with
    a = dp^T J dp, b = 2 p^T J dp, c = p^T J p > 0, intersected with the
    linear bound p0 + t dp0 >= 0."""
    BIG = 1e10
    a = _jdot(dp)
    b = 2.0 * (p[0] * dp[0] - jnp.sum(p[1:] * dp[1:]))
    c = jnp.maximum(_jdot(p), _EPS)
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # smallest positive root of the quadratic (stable form)
    denom = jnp.where(jnp.abs(a) > _EPS, 2.0 * a, _EPS)
    r1 = (-b - sq) / denom
    r2 = (-b + sq) / denom
    lo = jnp.minimum(r1, r2)
    hi = jnp.maximum(r1, r2)
    root = jnp.where(lo > 0, lo, jnp.where(hi > 0, hi, BIG))
    # a ~ 0 -> linear: c + b t = 0
    lin_root = jnp.where(b < 0, -c / jnp.where(b < 0, b, -1.0), BIG)
    t_quad = jnp.where(jnp.abs(a) > _EPS,
                       jnp.where(disc > 0, root, BIG),
                       lin_root)
    # head nonnegativity
    t_head = jnp.where(dp[0] < 0, -p[0] / jnp.where(dp[0] < 0, dp[0], -1.0), BIG)
    return jnp.clip(jnp.minimum(t_quad, t_head), 0.0, BIG)


@partial(jax.jit, static_argnames=("dims", "iters", "tol"))
def solve_socp(c: jax.Array, G: jax.Array, h: jax.Array,
               dims: Tuple[int, ...], iters: int = 30,
               tol: float = 1e-10) -> SOCPSolution:
    """Solve min c^T x s.t. Gx + s = h, s in product of SOCs of sizes `dims`.

    `dims` is static; the solver unrolls `iters` Mehrotra iterations and is
    safe under jit/vmap (no data-dependent control flow)."""
    dtype = jnp.result_type(c.dtype, G.dtype, h.dtype)
    c = c.astype(dtype)
    G = G.astype(dtype)
    h = h.astype(dtype)
    nx = c.shape[-1]
    nu = float(len(dims))
    e = jnp.concatenate([_unit_e(d, dtype) for d in dims])

    x = jnp.zeros((nx,), dtype)
    s = e
    z = e

    def cone_scalars(fn, *vecs):
        splits = [_split(v, dims) for v in vecs]
        return jnp.stack([fn(*[sp[i] for sp in splits])
                          for i in range(len(dims))])

    hnorm = jnp.maximum(1.0, jnp.linalg.norm(h))
    cnorm = jnp.maximum(1.0, jnp.linalg.norm(c))

    def _score(x, s, z):
        rx = c + G.T @ z
        rz = G @ x + s - h
        mu = jnp.abs(jnp.sum(s * z)) / nu
        return jnp.maximum(jnp.maximum(jnp.linalg.norm(rz) / hnorm,
                                       jnp.linalg.norm(rx) / cnorm), mu)

    def body(carry, _):
        x, s, z, best = carry
        bx, bs, bz, bscore = best
        # best-iterate tracking: iterating near the boundary can degrade the
        # NT scaling; we always return the best iterate seen.
        score = _score(x, s, z)
        better = score < bscore
        best = (jnp.where(better, x, bx), jnp.where(better, s, bs),
                jnp.where(better, z, bz), jnp.minimum(score, bscore))
        rx = c + G.T @ z
        rz = G @ x + s - h
        mu = jnp.sum(s * z) / nu
        # freeze once converged: iterating past convergence degenerates the
        # NT scaling (s, z on the cone boundary -> NaN); a where-select keeps
        # the graph static while making further iterations no-ops.
        done = score < tol

        # NT scaling per cone
        s_parts, z_parts = _split(s, dims), _split(z, dims)
        scal = [_nt_scaling(sk, zk) for sk, zk in zip(s_parts, z_parts)]
        lam = jnp.concatenate([_w_mul(wb, et, zk)
                               for (wb, et), zk in zip(scal, z_parts)])
        lam_parts = _split(lam, dims)

        def winv2(v):
            vp = _split(v, dims)
            return jnp.concatenate([_winv2_mul(wb, et, vk)
                                    for (wb, et), vk in zip(scal, vp)])

        def wmulT(v):  # W^T = W (symmetric)
            vp = _split(v, dims)
            return jnp.concatenate([_w_mul(wb, et, vk)
                                    for (wb, et), vk in zip(scal, vp)])

        def winvT(v):
            vp = _split(v, dims)
            return jnp.concatenate([_winv_mul(wb, et, vk)
                                    for (wb, et), vk in zip(scal, vp)])

        # KKT reduction: [G^T W^{-2} G] dx = -rx - G^T W^{-2} (rz - W^T d)
        WinvG = jax.vmap(winv2, in_axes=1, out_axes=1)(G)  # W^{-2} G columns
        H = G.T @ WinvG
        H = H + 1e-12 * jnp.trace(H) * jnp.eye(nx, dtype=dtype)
        Hcho = jax.scipy.linalg.cho_factor(H)

        def kkt_solve(d_scaled):
            """d_scaled solves: W dz + W^{-T} ds = -d_scaled."""
            rhs = -rx - G.T @ winv2(rz - wmulT(d_scaled))
            dx = jax.scipy.linalg.cho_solve(Hcho, rhs)
            ds = -rz - G @ dx
            dz = winv2(G @ dx + rz - wmulT(d_scaled))
            return dx, ds, dz

        # ---- affine (predictor) step: d = lambda
        dx_a, ds_a, dz_a = kkt_solve(lam)
        step_s = cone_scalars(_max_step, s, ds_a)
        step_z = cone_scalars(_max_step, z, dz_a)
        alpha_a = jnp.minimum(jnp.min(step_s), jnp.min(step_z))
        alpha_a = jnp.minimum(alpha_a, 1.0)
        mu_a = jnp.sum((s + alpha_a * ds_a) * (z + alpha_a * dz_a)) / nu
        sigma = jnp.clip((mu_a / jnp.maximum(mu, _EPS)) ** 3, 0.0, 1.0)

        # ---- corrector: d = lambda o lambda + (W^{-T}ds_a)o(W dz_a) - sigma mu e
        Wds = winvT(ds_a)
        Wdz = wmulT(dz_a)
        corr_parts = [_jordan_mul(a, b)
                      for a, b in zip(_split(Wds, dims), _split(Wdz, dims))]
        rs = jnp.concatenate([
            _jordan_mul(lk, lk) + ck - sigma * mu * _unit_e(dk, dtype)
            for lk, ck, dk in zip(lam_parts, corr_parts, dims)])
        d_comb = jnp.concatenate([
            _jordan_inv_mul(lk, rk)
            for lk, rk in zip(lam_parts, _split(rs, dims))])

        dx, ds, dz = kkt_solve(d_comb)
        step_s = cone_scalars(_max_step, s, ds)
        step_z = cone_scalars(_max_step, z, dz)
        alpha = 0.99 * jnp.minimum(jnp.min(step_s), jnp.min(step_z))
        alpha = jnp.minimum(alpha, 1.0)

        x_new = x + alpha * dx
        s_new = s + alpha * ds
        z_new = z + alpha * dz
        keep = done | ~jnp.all(jnp.isfinite(
            jnp.concatenate([x_new, s_new, z_new])))
        x = jnp.where(keep, x, x_new)
        s = jnp.where(keep, s, s_new)
        z = jnp.where(keep, z, z_new)
        return (x, s, z, best), None

    big = jnp.asarray(jnp.inf, dtype)
    init_best = (x, s, z, big)
    (x, s, z, best), _ = jax.lax.scan(body, (x, s, z, init_best), None,
                                      length=iters)
    # final candidate vs best seen
    score = _score(x, s, z)
    bx, bs, bz, bscore = best
    better = score < bscore
    x = jnp.where(better, x, bx)
    s = jnp.where(better, s, bs)
    z = jnp.where(better, z, bz)

    pres = jnp.linalg.norm(G @ x + s - h) / hnorm
    dres = jnp.linalg.norm(c + G.T @ z) / cnorm
    gap = jnp.abs(jnp.sum(s * z)) / nu
    return SOCPSolution(x=x, s=s, z=z, pres=pres, dres=dres, gap=gap,
                        pcost=c @ x)


def socp_residuals(sol: SOCPSolution, tol: float = 1e-6):
    """Feasibility indicator usable in-graph as a fallback trigger."""
    return (sol.pres < tol) & (sol.dres < tol)


def cones_from_constraints(constraints):
    """Build (G, h, dims) from a list of SOC constraints
    ||A_k x + b_k|| <= c_k^T x + d_k (the reference's socp_constraints
    layout, optimizers.py:6-38):  G_k = [-c_k^T; -A_k], h_k = [d_k; b_k]."""
    Gs, hs, dims = [], [], []
    for (A, b, cvec, d) in constraints:
        Gk = jnp.concatenate([-cvec[None, :], -A], axis=0)
        hk = jnp.concatenate([jnp.reshape(d, (1,)), b])
        Gs.append(Gk)
        hs.append(hk)
        dims.append(Gk.shape[0])
    return jnp.concatenate(Gs, 0), jnp.concatenate(hs, 0), tuple(dims)
