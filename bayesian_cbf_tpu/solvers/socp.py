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

TPU-first design:
  * all cones are zero-padded to a common dimension dmax at trace time
    (padding coordinates stay exactly zero through the whole Jordan/NT
    algebra), so every per-cone operation is one vectorized (C, dmax)
    kernel — constant op count per iteration regardless of cone count,
    which keeps the solver latency-bound-friendly inside a rollout scan;
  * fixed iteration count, `where`-guarded numerics, best-iterate
    tracking -> fully jittable and vmappable: thousands of SOCPs solve in
    parallel as one batched program (the >=10k control-steps/sec enabler,
    BASELINE.md north star);
  * infeasibility cannot raise inside a scan (the reference raises
    InfeasibleProblemError, optimizers.py:74-86); the solution carries
    residual diagnostics for in-graph fallbacks (SURVEY.md 5.3).

Algorithm: Mehrotra predictor-corrector conelp with NT scaling
(Vandenberghe, "The CVXOPT linear and quadratic cone program solvers";
Alizadeh & Goldfarb 2003).  Per SOC with J = diag(1, -I):
    sbar = s / sqrt(s^T J s),  zbar = z / sqrt(z^T J z),
    gamma^2 = (1 + sbar^T zbar) / 2,
    wbar = (sbar + J zbar) / (2 gamma),       (wbar^T J wbar = 1)
    eta  = (s^T J s / z^T J z)^{1/4},
    W^2  = eta^2 (2 wbar wbar^T - J),
    W^{-2} = eta^{-2} (2 (J wbar)(J wbar)^T - J).
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-14

# All einsums in this solver are pinned to full-f32 accumulation: on TPU
# the default matmul precision lowers these tiny (C, d, nx) contractions
# to bf16 MXU passes, which was the WHOLE source of the round-2 f32
# plateau of the vmapped plain path (KKT scores 1e-2..1 where the Pallas
# kernel — explicit VPU mul+sum, naturally full f32 — reached 1e-4).
# Measured round 3 (256 random mixed-cone f32 problems on chip): median
# KKT 1.03e-2 default vs 3.02e-4 pinned vs 3.04e-4 kernel.  The dispatch
# gate below (_socp_dispatch) is therefore a pure PERFORMANCE choice; the
# two paths are numerically equivalent.
_HI = jax.lax.Precision.HIGHEST


def _esum(spec, *ops):
    return jnp.einsum(spec, *ops, precision=_HI)


class SOCPSolution(NamedTuple):
    x: jax.Array
    s: jax.Array          # (C, dmax) padded slacks
    z: jax.Array          # (C, dmax) padded duals
    pres: jax.Array       # primal residual |Gx+s-h| / max(1,|h|)
    dres: jax.Array       # dual residual |c+G^T z| / max(1,|c|)
    gap: jax.Array        # complementarity |s^T z| / nu
    pcost: jax.Array      # c^T x


# ---- vectorized cone algebra on (C, d) blocks -----------------------------

def _jdot(U):
    return U[:, 0] ** 2 - jnp.sum(U[:, 1:] ** 2, axis=1)


def _jflip(U):
    """J U: negate tail coordinates."""
    return jnp.concatenate([U[:, :1], -U[:, 1:]], axis=1)


def _jmul(U, V):
    """Jordan product per cone: (u.v, u0 v1 + v0 u1)."""
    head = jnp.sum(U * V, axis=1, keepdims=True)
    tail = U[:, :1] * V[:, 1:] + V[:, :1] * U[:, 1:]
    return jnp.concatenate([head, tail], axis=1)


def _jinv_mul(L, V):
    """Solve L o U = V per cone."""
    det = _jdot(L)
    det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    l0 = jnp.where(jnp.abs(L[:, 0]) < _EPS, _EPS, L[:, 0])
    u0 = (L[:, 0] * V[:, 0] - jnp.sum(L[:, 1:] * V[:, 1:], axis=1)) / det
    u1 = (V[:, 1:] - u0[:, None] * L[:, 1:]) / l0[:, None]
    return jnp.concatenate([u0[:, None], u1], axis=1)


def _nt_scaling(S, Z):
    """(wbar (C,d), eta (C,)) with W = eta * Wbar per cone."""
    ss = jnp.sqrt(jnp.maximum(_jdot(S), _EPS))
    zz = jnp.sqrt(jnp.maximum(_jdot(Z), _EPS))
    Sb, Zb = S / ss[:, None], Z / zz[:, None]
    gam = jnp.sqrt(jnp.maximum((1.0 + jnp.sum(Sb * Zb, axis=1)) * 0.5, _EPS))
    Wb = (Sb + _jflip(Zb)) / (2.0 * gam[:, None])
    eta = jnp.sqrt(ss / zz)
    return Wb, eta


def _w_mul(Wb, eta, V):
    """W V per cone (Wbar = [[w0, w1^T],[w1, I + w1 w1^T/(1+w0)]])."""
    w0, w1 = Wb[:, :1], Wb[:, 1:]
    dot = jnp.sum(w1 * V[:, 1:], axis=1, keepdims=True)
    head = w0 * V[:, :1] + dot
    tail = V[:, :1] * w1 + V[:, 1:] + w1 * (dot / (1.0 + w0))
    return eta[:, None] * jnp.concatenate([head, tail], axis=1)


def _winv_mul(Wb, eta, V):
    """W^{-1} V; Wbar^{-1} = J Wbar J."""
    U = _w_mul(Wb, jnp.ones_like(eta), _jflip(V))
    return _jflip(U) / eta[:, None]


def _winv2_mul(Wb, eta, V):
    """W^{-2} V = eta^{-2} (2 (J wbar)(J wbar)^T - J) V."""
    Jw = _jflip(Wb)
    dots = jnp.sum(Jw * V, axis=1, keepdims=True)
    return (2.0 * Jw * dots - _jflip(V)) / (eta ** 2)[:, None]


def _max_step(P, D):
    """Per-cone largest t >= 0 with P + t D in the SOC (P interior)."""
    BIG = 1e10
    a = _jdot(D)
    b = 2.0 * (P[:, 0] * D[:, 0] - jnp.sum(P[:, 1:] * D[:, 1:], axis=1))
    cq = jnp.maximum(_jdot(P), _EPS)
    disc = b * b - 4.0 * a * cq
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    denom = jnp.where(jnp.abs(a) > _EPS, 2.0 * a, _EPS)
    r1 = (-b - sq) / denom
    r2 = (-b + sq) / denom
    lo, hi = jnp.minimum(r1, r2), jnp.maximum(r1, r2)
    root = jnp.where(lo > 0, lo, jnp.where(hi > 0, hi, BIG))
    lin_root = jnp.where(b < 0, -cq / jnp.where(b < 0, b, -1.0), BIG)
    t_quad = jnp.where(jnp.abs(a) > _EPS,
                       jnp.where(disc > 0, root, BIG), lin_root)
    t_head = jnp.where(D[:, 0] < 0,
                       -P[:, 0] / jnp.where(D[:, 0] < 0, D[:, 0], -1.0), BIG)
    return jnp.clip(jnp.minimum(t_quad, t_head), 0.0, BIG)


_UNROLL_MAX_N = 8


def _chol_unrolled(H):
    """Statically-unrolled Cholesky of a small (n, n) PD matrix.

    Identical arithmetic to `cholesky`, but expressed as n(n+1)/2 scalar
    ops instead of one LAPACK/XLA `cholesky` call: under the rollout
    vmap+scan, XLA's batched small `cholesky` + `triangular_solve` lower
    to latency-bound loop kernels that cannot fuse with the surrounding
    cone algebra — the dominant cost of the IPM floor (NOTES_round2).
    Scalar unrolling turns the whole KKT solve into one fused elementwise
    chain.  n is a trace-time constant (nvar of the SOCP), <= 8 in every
    controller in this package (unicycle nvar=4, pendulum nvar=4).
    """
    n = H.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            acc = H[..., i, j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(acc, _EPS))
            else:
                L[i][j] = acc / L[j][j]
    return L


def _chol_solve_unrolled(L, b):
    """Solve (L L^T) x = b with statically-unrolled substitution.
    `L` is the list-of-lists factor from `_chol_unrolled`; b is (..., n)."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        acc = b[..., i]
        for k in range(i):
            acc = acc - L[i][k] * y[k]
        y[i] = acc / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - L[k][i] * x[k]
        x[i] = acc / L[i][i]
    return jnp.stack(x, axis=-1)


def _interior_shift(S):
    """Re-center a (possibly boundary) point into the cone interior for
    warm starts: per cone, push the head coordinate up until the SOC
    margin s0 - ||s1|| reaches a scale-relative floor.  Padded coordinates
    (exact zeros) are unaffected."""
    scale = jnp.linalg.norm(S, axis=1)
    floor = 1e-2 * (1.0 + scale)
    margin = S[:, 0] - jnp.linalg.norm(S[:, 1:], axis=1)
    shift = jnp.maximum(0.0, floor - margin)
    return S.at[:, 0].add(shift)


def _pad_cones(c, G, h, dims):
    """Zero-pad cone blocks to a common dimension (trace-time, static)."""
    dtype = c.dtype
    nx = c.shape[-1]
    C = len(dims)
    dmax = max(dims)
    Gp = jnp.zeros((C, dmax, nx), dtype)
    hp = jnp.zeros((C, dmax), dtype)
    off = 0
    for i, d in enumerate(dims):
        Gp = Gp.at[i, :d, :].set(G[off:off + d, :])
        hp = hp.at[i, :d].set(h[off:off + d])
        off += d
    return Gp, hp


def _score_padded(c, Gp, hp, x, S, Z):
    """Scale-relative KKT score of a point for the padded problem."""
    nu = float(Gp.shape[0])
    hnorm = jnp.maximum(1.0, jnp.linalg.norm(hp))
    cnorm = jnp.maximum(1.0, jnp.linalg.norm(c))
    rx = c + _esum('cdn,cd->n', Gp, Z)
    rz = _esum('cdn,n->cd', Gp, x) + S - hp
    mu = jnp.abs(jnp.sum(S * Z)) / nu
    return jnp.maximum(jnp.maximum(jnp.linalg.norm(rz) / hnorm,
                                   jnp.linalg.norm(rx) / cnorm), mu)


def _solve_padded_plain(c, Gp, hp, sx, sS, sZ, iters, tol):
    """Fixed-iteration Mehrotra IPM on padded cone blocks from an interior
    start point (sx, sS, sZ); returns the best iterate (x, S, Z).  This is
    the reference implementation; on TPU f32 the vmapped hot path runs the
    Pallas lane-major kernel instead (see `_solve_padded`)."""
    dtype = c.dtype
    nx = c.shape[-1]
    C, dmax = hp.shape
    nu = float(C)
    e = jnp.zeros((C, dmax), dtype).at[:, 0].set(1.0)
    x0 = jnp.zeros((nx,), dtype)
    hnorm = jnp.maximum(1.0, jnp.linalg.norm(hp))
    cnorm = jnp.maximum(1.0, jnp.linalg.norm(c))

    def _score(x, S, Z):
        return _score_padded(c, Gp, hp, x, S, Z)

    def body(carry, _):
        x, S, Z, best = carry
        bx, bS, bZ, bscore = best
        score = _score(x, S, Z)
        better = score < bscore
        best = (jnp.where(better, x, bx), jnp.where(better, S, bS),
                jnp.where(better, Z, bZ), jnp.minimum(score, bscore))
        done = score < tol

        rx = c + _esum('cdn,cd->n', Gp, Z)
        rz = _esum('cdn,n->cd', Gp, x) + S - hp
        mu = jnp.sum(S * Z) / nu

        Wb, eta = _nt_scaling(S, Z)
        lam = _w_mul(Wb, eta, Z)

        # W^{-2} applied to every column of G (vectorized over nx)
        Jw = _jflip(Wb)                                    # (C, d)
        dots = _esum('cd,cdn->cn', Jw, Gp)            # (C, nx)
        JG = jnp.concatenate([Gp[:, :1, :], -Gp[:, 1:, :]], axis=1)
        Winv2G = (2.0 * Jw[:, :, None] * dots[:, None, :] - JG) \
            / (eta ** 2)[:, None, None]                    # (C, d, nx)
        H = _esum('cdn,cdm->nm', Gp, Winv2G)
        H = H + 1e-12 * jnp.trace(H) * jnp.eye(nx, dtype=dtype)
        if nx <= _UNROLL_MAX_N:
            Lun = _chol_unrolled(H)
            hsolve = partial(_chol_solve_unrolled, Lun)
        else:
            Hcho = jax.scipy.linalg.cho_factor(H)
            hsolve = partial(jax.scipy.linalg.cho_solve, Hcho)

        def kkt_solve(Dscaled):
            """Dscaled (C,d) with  W dz + W^{-T} ds = -Dscaled."""
            rhs_cd = rz - _w_mul(Wb, eta, Dscaled)
            rhs = -rx - _esum('cdn,cd->n', Gp,
                                   _winv2_mul(Wb, eta, rhs_cd))
            dx = hsolve(rhs)
            Gdx = _esum('cdn,n->cd', Gp, dx)
            dS = -rz - Gdx
            dZ = _winv2_mul(Wb, eta, Gdx + rhs_cd)
            return dx, dS, dZ

        # affine (predictor)
        dx_a, dS_a, dZ_a = kkt_solve(lam)
        alpha_a = jnp.minimum(1.0, jnp.minimum(
            jnp.min(_max_step(S, dS_a)), jnp.min(_max_step(Z, dZ_a))))
        mu_a = jnp.sum((S + alpha_a * dS_a) * (Z + alpha_a * dZ_a)) / nu
        sigma = jnp.clip((mu_a / jnp.maximum(mu, _EPS)) ** 3, 0.0, 1.0)

        # corrector
        corr = _jmul(_winv_mul(Wb, eta, dS_a), _w_mul(Wb, eta, dZ_a))
        rs = _jmul(lam, lam) + corr - sigma * mu * e
        Dcomb = _jinv_mul(lam, rs)

        dx, dS, dZ = kkt_solve(Dcomb)
        alpha = 0.99 * jnp.minimum(
            jnp.min(_max_step(S, dS)), jnp.min(_max_step(Z, dZ)))
        alpha = jnp.minimum(alpha, 1.0)

        x_new = x + alpha * dx
        S_new = S + alpha * dS
        Z_new = Z + alpha * dZ
        finite = (jnp.all(jnp.isfinite(x_new)) & jnp.all(jnp.isfinite(S_new))
                  & jnp.all(jnp.isfinite(Z_new)))
        keep = done | ~finite
        x = jnp.where(keep, x, x_new)
        S = jnp.where(keep, S, S_new)
        Z = jnp.where(keep, Z, Z_new)
        return (x, S, Z, best), None

    big = jnp.asarray(jnp.inf, dtype)
    init = (sx, sS, sZ, (x0, e, e, big))
    (x, S, Z, best), _ = jax.lax.scan(body, init, None, length=iters)
    score = _score(x, S, Z)
    bx, bS, bZ, bscore = best
    better = score < bscore
    x = jnp.where(better, x, bx)
    S = jnp.where(better, S, bS)
    Z = jnp.where(better, Z, bZ)
    return x, S, Z


def _solve_padded(c, Gp, hp, sx, sS, sZ, iters, tol):
    """Dispatch for the padded-core solve: under vmap on TPU f32 the whole
    batch of IPMs runs as ONE Pallas lane-major kernel (ops/pallas_ipm.py)
    — inside a rollout scan the plain path costs ~20 un-fusable kernels
    per Mehrotra iteration per step; elsewhere, the plain implementation.

    This gate is a pure PERFORMANCE choice: with the solver's einsums
    pinned to full-f32 accumulation (`_esum`), the plain path reaches the
    same KKT scores as the kernel on TPU f32 (median 3.0e-4 on 256 random
    mixed-cone problems, round-3 record `records/tpu_round3.jsonl:
    ipm_plain_vs_kernel_kkt`) — any config the kernel doesn't cover
    (nx > 8, d > 16, C > 16, non-f32, non-TPU) gets equivalent numerics,
    just through more XLA kernels."""
    if c.ndim == 1:
        return _socp_dispatch(iters, tol)(c, Gp, hp, sx, sS, sZ)
    return _solve_padded_plain(c, Gp, hp, sx, sS, sZ, iters, tol)


@lru_cache(maxsize=None)
def _socp_dispatch(iters, tol):
    from jax import custom_batching

    @custom_batching.custom_vmap
    def dispatch(c, Gp, hp, sx, sS, sZ):
        # unbatched solves stay on the plain path: a size-1 kernel batch
        # measured neutral-to-slower (one grid cell doesn't amortize the
        # serial cone recurrence; see the kinv_logdet note in
        # ops/cholinv.py for the same finding on the sweep kernel)
        return _solve_padded_plain(c, Gp, hp, sx, sS, sZ, iters, tol)

    @dispatch.def_vmap
    def _rule(axis_size, in_batched, c, Gp, hp, sx, sS, sZ):
        use = USE_PALLAS_IPM
        if use is None:
            use = (jax.default_backend() == "tpu"
                   and c.dtype == jnp.float32
                   and c.shape[-1] <= _UNROLL_MAX_N
                   and hp.shape[-1] <= 16 and hp.shape[-2] <= 16)
        if use:
            from ..ops import pallas_ipm
            # broadcast operands that are constant across the batch (the
            # objective vector and cold-start points usually are)
            c_, Gp_, hp_, sx_, sS_, sZ_ = (
                a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                for a, b in zip((c, Gp, hp, sx, sS, sZ), in_batched))
            out = pallas_ipm.batched_ipm(c_, Gp_, hp_, sx_, sS_, sZ_,
                                         iters=iters, tol=tol,
                                         interpret=pallas_ipm.INTERPRET)
        else:
            axes = tuple(0 if b else None for b in in_batched)
            out = jax.vmap(
                lambda *a: _solve_padded_plain(*a, iters, tol),
                in_axes=axes)(c, Gp, hp, sx, sS, sZ)
        return out, (True, True, True)

    return dispatch


# None = auto (Pallas on TPU f32 under vmap); True/False force
USE_PALLAS_IPM = None


@partial(jax.jit, static_argnames=("dims", "iters", "tol"))
def solve_socp(c: jax.Array, G: jax.Array, h: jax.Array,
               dims: Tuple[int, ...], iters: int = 30,
               tol: float = 1e-10, warm=None) -> SOCPSolution:
    """Solve min c^T x s.t. Gx + s = h, s in product of SOCs of sizes `dims`.

    `dims` is static; the body is `iters` Mehrotra iterations over
    vectorized padded cone blocks (one lax.scan on the plain path; one
    Pallas kernel for the whole batch under vmap on TPU).

    `warm` (optional): an (x, S, Z) triple from a previous solve of a
    problem with identical cone structure (e.g. the previous control step
    of a rollout scan, whose data moved by O(dt)).  The slacks/duals are
    re-centered into the cone interior; this is an infeasible-start IPM so
    the warm point need not be feasible for the new data.  Non-finite warm
    points fall back to the cold start in-graph."""
    dtype = jnp.result_type(c.dtype, G.dtype, h.dtype)
    c = c.astype(dtype)
    G = G.astype(dtype)
    h = h.astype(dtype)
    nx = c.shape[-1]
    C = len(dims)
    dmax = max(dims)
    nu = float(C)
    Gp, hp = _pad_cones(c, G, h, dims)
    e = jnp.zeros((C, dmax), dtype).at[:, 0].set(1.0)
    x0 = jnp.zeros((nx,), dtype)

    if warm is None:
        sx, sS, sZ = x0, e, e
    else:
        wx, wS, wZ = (w.astype(dtype) for w in warm)
        ok = (jnp.all(jnp.isfinite(wx)) & jnp.all(jnp.isfinite(wS))
              & jnp.all(jnp.isfinite(wZ)))
        wx = jnp.where(ok, wx, x0)
        wS = jnp.where(ok, wS, e)
        wZ = jnp.where(ok, wZ, e)
        # staleness gate: a warm point is only useful if it is already
        # near-feasible for TODAY'S problem (the previous step's data moved
        # by O(dt)).  A previous solve that failed — or a problem jump
        # (e.g. a GP refit) — leaves a high-residual point that would
        # poison every subsequent warm-started solve in the scan chain;
        # reset those to the cold start.  Scored on the RAW carried point:
        # the interiority shift below perturbs the primal residual by the
        # shift size, which must not count against the gate.
        ok = ok & (_score_padded(c, Gp, hp, wx, wS, wZ) < 0.05)
        sx = jnp.where(ok, wx, x0)
        sS = jnp.where(ok, _interior_shift(wS), e)
        sZ = jnp.where(ok, _interior_shift(wZ), e)

    x, S, Z = _solve_padded(c, Gp, hp, sx, sS, sZ, iters, tol)

    hnorm = jnp.maximum(1.0, jnp.linalg.norm(hp))
    cnorm = jnp.maximum(1.0, jnp.linalg.norm(c))
    pres = jnp.linalg.norm(_esum('cdn,n->cd', Gp, x) + S - hp) / hnorm
    dres = jnp.linalg.norm(c + _esum('cdn,cd->n', Gp, Z)) / cnorm
    gap = jnp.abs(jnp.sum(S * Z)) / nu
    return SOCPSolution(x=x, s=S, z=Z, pres=pres, dres=dres, gap=gap,
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
