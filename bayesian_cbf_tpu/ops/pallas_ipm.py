"""Pallas TPU kernel: the ENTIRE batched SOCP interior-point solve.

Why: the rollout scan solves one controller SOCP per step per rollout.
The vmapped jnp implementation (solvers/socp.py `_solve_padded_plain`)
is arithmetically tiny — (B, C<=8, d<=8) cone blocks — but every
Mehrotra iteration crosses ~20 fusion boundaries (NT scaling, two KKT
solves, step-length reductions...), and with vmap putting the batch on
axis 0 each XLA kernel works on (B, 4, 6) arrays whose minor (4, 6)
tile pads to (8, 128): 32x lane waste AND per-kernel fixed cost.  At
the flagship config the SOCP floor measured ~0.8 ms/step for the whole
batch — fusion-boundary-bound, not compute-bound.

This kernel runs ALL `iters` Mehrotra iterations for a whole batch
chunk as ONE Mosaic program in lane-major layout:

  * the batch lives on the LANES: every quantity is a (d, CB) or
    (1, CB) tile, so each vector op is a handful of fully-occupied
    vregs with no kernel-launch cost between them;
  * the cone axis C and the variable axis nx are unrolled statically in
    Python — per-cone state is a list of (d, CB) values, the KKT system
    H is a list-of-lists of (1, CB) scalars factored by the same
    statically-unrolled Cholesky trick as solvers/socp.py;
  * per-element `done` / non-finite-step rejection / best-iterate
    tracking are (1, CB) masks, preserving the plain path's semantics
    element-wise.

The algorithm is bit-comparable (same operations, same guards) to
`_solve_padded_plain`; tests cross-check both in interpret mode.  f32
only (the TPU fast path).  Cite: SURVEY.md 3.1 (the reference's
per-step GUROBI round trip this whole design replaces).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-14
CB = 256          # batch lanes per grid cell
INTERPRET = False  # tests flip this to exercise the kernel on CPU


def _round_up(x, m):
    return (x + m - 1) // m * m


def _ipm_kernel(nx, C, d, iters, tol,
                c_ref, g_ref, h_ref, sx_ref, ss_ref, sz_ref,
                x_ref, s_ref, z_ref):
    f32 = c_ref.dtype
    nu = float(C)

    ri = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    e = (ri == 0).astype(f32)                       # (d, 1) head selector
    sgn = 2.0 * e - 1.0                             # +1 head, -1 tail
    te = 1.0 - e                                    # tail selector

    # problem data as static lists of lane-major tiles
    G = [[g_ref[c, :, i, :] for i in range(nx)] for c in range(C)]
    h = [h_ref[c] for c in range(C)]
    cvec = [c_ref[i:i + 1, :] for i in range(nx)]

    def rsum(U):
        return jnp.sum(U, axis=0, keepdims=True)    # (d, CB) -> (1, CB)

    def jdot(U):
        return rsum(U * U * sgn)

    def jflip(U):
        return U * sgn

    def jmul(U, V):
        full = U[0:1] * V + V[0:1] * U
        return full * te + e * rsum(U * V)

    def jinv_mul(L, V):
        det = jdot(L)
        det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
        l0 = jnp.where(jnp.abs(L[0:1]) < _EPS, _EPS, L[0:1])
        u0 = rsum(L * V * sgn) / det
        return e * u0 + te * (V - u0 * L) / l0

    def nt_scaling(S, Z):
        ss = jnp.sqrt(jnp.maximum(jdot(S), _EPS))
        zz = jnp.sqrt(jnp.maximum(jdot(Z), _EPS))
        Sb, Zb = S / ss, Z / zz
        gam = jnp.sqrt(jnp.maximum((1.0 + rsum(Sb * Zb)) * 0.5, _EPS))
        Wb = (Sb + jflip(Zb)) / (2.0 * gam)
        eta = jnp.sqrt(ss / zz)
        return Wb, eta

    def w_mul(Wb, eta, V):
        w0 = Wb[0:1]
        w1 = Wb * te
        dot = rsum(w1 * V)
        head = w0 * V[0:1] + dot
        tail = V[0:1] * w1 + V * te + w1 * (dot / (1.0 + w0))
        return eta * (e * head + tail)

    def winv_mul(Wb, eta, V):
        return jflip(w_mul(Wb, jnp.ones_like(eta), jflip(V))) / eta

    def winv2_mul(Wb, eta, V):
        Jw = jflip(Wb)
        return (2.0 * Jw * rsum(Jw * V) - jflip(V)) / (eta * eta)

    def max_step(P, D):
        BIG = 1e10
        a = jdot(D)
        b = 2.0 * rsum(P * D * sgn)
        cq = jnp.maximum(jdot(P), _EPS)
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
        D0, P0 = D[0:1], P[0:1]
        t_head = jnp.where(D0 < 0, -P0 / jnp.where(D0 < 0, D0, -1.0), BIG)
        return jnp.clip(jnp.minimum(t_quad, t_head), 0.0, BIG)

    hnorm = jnp.maximum(1.0, jnp.sqrt(sum(rsum(h[c] * h[c])
                                          for c in range(C))))
    cnorm = jnp.maximum(1.0, jnp.sqrt(sum(cvec[i] * cvec[i]
                                          for i in range(nx))))

    def residuals(xs, S, Z):
        rx = [cvec[i] + sum(rsum(G[c][i] * Z[c]) for c in range(C))
              for i in range(nx)]
        rz = [sum(G[c][i] * xs[i] for i in range(nx)) + S[c] - h[c]
              for c in range(C)]
        return rx, rz

    def score_of(xs, S, Z):
        rx, rz = residuals(xs, S, Z)
        rxn = jnp.sqrt(sum(r * r for r in rx))
        rzn = jnp.sqrt(sum(rsum(r * r) for r in rz))
        mu = jnp.abs(sum(rsum(S[c] * Z[c]) for c in range(C))) / nu
        return jnp.maximum(jnp.maximum(rzn / hnorm, rxn / cnorm), mu)

    def chol_scal(H):
        """Statically-unrolled Cholesky on (1, CB) scalar tiles."""
        L = [[None] * nx for _ in range(nx)]
        for i in range(nx):
            for j in range(i + 1):
                acc = H[i][j]
                for k in range(j):
                    acc = acc - L[i][k] * L[j][k]
                if i == j:
                    L[i][j] = jnp.sqrt(jnp.maximum(acc, _EPS))
                else:
                    L[i][j] = acc / L[j][j]
        return L

    def chol_solve_scal(L, b):
        y = [None] * nx
        for i in range(nx):
            acc = b[i]
            for k in range(i):
                acc = acc - L[i][k] * y[k]
            y[i] = acc / L[i][i]
        xs = [None] * nx
        for i in reversed(range(nx)):
            acc = y[i]
            for k in range(i + 1, nx):
                acc = acc - L[k][i] * xs[k]
            xs[i] = acc / L[i][i]
        return xs

    e_b = jnp.broadcast_to(e, h[0].shape)           # cold-start point
    zero_s = jnp.zeros_like(cvec[0])

    def body(_, carry):
        xs = list(carry[0])
        S = list(carry[1])
        Z = list(carry[2])
        bx = list(carry[3])
        bS = list(carry[4])
        bZ = list(carry[5])
        bscore = carry[6]

        score = score_of(xs, S, Z)
        better = score < bscore
        bx = [jnp.where(better, a, b) for a, b in zip(xs, bx)]
        bS = [jnp.where(better, a, b) for a, b in zip(S, bS)]
        bZ = [jnp.where(better, a, b) for a, b in zip(Z, bZ)]
        bscore = jnp.minimum(score, bscore)
        done = score < tol

        rx, rz = residuals(xs, S, Z)
        mu = sum(rsum(S[c] * Z[c]) for c in range(C)) / nu

        Wb, eta, lam, Jw, W2G = [], [], [], [], []
        for c in range(C):
            wb, et = nt_scaling(S[c], Z[c])
            Wb.append(wb)
            eta.append(et)
            lam.append(w_mul(wb, et, Z[c]))
            jw = jflip(wb)
            Jw.append(jw)
            ie2 = 1.0 / (et * et)
            W2G.append([(2.0 * jw * rsum(jw * G[c][i]) - jflip(G[c][i]))
                        * ie2 for i in range(nx)])

        H = [[None] * nx for _ in range(nx)]
        for i in range(nx):
            for j in range(i + 1):
                H[i][j] = sum(rsum(G[c][i] * W2G[c][j]) for c in range(C))
        trH = sum(H[i][i] for i in range(nx))
        for i in range(nx):
            H[i][i] = H[i][i] + 1e-12 * trH
        L = chol_scal(H)

        def kkt_solve(Dscaled):
            rhs_cd = [rz[c] - w_mul(Wb[c], eta[c], Dscaled[c])
                      for c in range(C)]
            w2rhs = [winv2_mul(Wb[c], eta[c], rhs_cd[c]) for c in range(C)]
            rhs = [-rx[i] - sum(rsum(G[c][i] * w2rhs[c]) for c in range(C))
                   for i in range(nx)]
            dx = chol_solve_scal(L, rhs)
            Gdx = [sum(G[c][i] * dx[i] for i in range(nx)) for c in range(C)]
            dS = [-rz[c] - Gdx[c] for c in range(C)]
            dZ = [winv2_mul(Wb[c], eta[c], Gdx[c] + rhs_cd[c])
                  for c in range(C)]
            return dx, dS, dZ

        # affine (predictor)
        dx_a, dS_a, dZ_a = kkt_solve(lam)
        alpha_a = jnp.ones_like(mu)
        for c in range(C):
            alpha_a = jnp.minimum(alpha_a, max_step(S[c], dS_a[c]))
            alpha_a = jnp.minimum(alpha_a, max_step(Z[c], dZ_a[c]))
        mu_a = sum(rsum((S[c] + alpha_a * dS_a[c])
                        * (Z[c] + alpha_a * dZ_a[c])) for c in range(C)) / nu
        ratio = mu_a / jnp.maximum(mu, _EPS)
        sigma = jnp.clip(ratio * ratio * ratio, 0.0, 1.0)

        # corrector
        Dcomb = []
        for c in range(C):
            corr = jmul(winv_mul(Wb[c], eta[c], dS_a[c]),
                        w_mul(Wb[c], eta[c], dZ_a[c]))
            rs = jmul(lam[c], lam[c]) + corr - sigma * mu * e
            Dcomb.append(jinv_mul(lam[c], rs))

        dx, dS, dZ = kkt_solve(Dcomb)
        alpha = jnp.full_like(mu, 1.0 / 0.99)
        for c in range(C):
            alpha = jnp.minimum(alpha, max_step(S[c], dS[c]))
            alpha = jnp.minimum(alpha, max_step(Z[c], dZ[c]))
        alpha = jnp.minimum(0.99 * alpha, 1.0)

        xs_n = [xs[i] + alpha * dx[i] for i in range(nx)]
        S_n = [S[c] + alpha * dS[c] for c in range(C)]
        Z_n = [Z[c] + alpha * dZ[c] for c in range(C)]
        # f32 mask arithmetic: Mosaic's bool reductions are restrictive
        finite = jnp.ones_like(mu)
        for a in xs_n + S_n + Z_n:
            finite = finite * jnp.min(jnp.isfinite(a).astype(a.dtype),
                                      axis=0, keepdims=True)
        keep = done | (finite < 0.5)
        xs = [jnp.where(keep, a, b) for a, b in zip(xs, xs_n)]
        S = [jnp.where(keep, a, b) for a, b in zip(S, S_n)]
        Z = [jnp.where(keep, a, b) for a, b in zip(Z, Z_n)]
        return (tuple(xs), tuple(S), tuple(Z),
                tuple(bx), tuple(bS), tuple(bZ), bscore)

    xs0 = tuple(sx_ref[i:i + 1, :] for i in range(nx))
    S0 = tuple(ss_ref[c] for c in range(C))
    Z0 = tuple(sz_ref[c] for c in range(C))
    cold_x = tuple(zero_s for _ in range(nx))
    cold_SZ = tuple(e_b for _ in range(C))
    big = jnp.full_like(zero_s, jnp.inf)
    carry = (xs0, S0, Z0, cold_x, cold_SZ, cold_SZ, big)
    carry = jax.lax.fori_loop(0, iters, body, carry)
    xs, S, Z, bx, bS, bZ, bscore = carry

    score = score_of(list(xs), list(S), list(Z))
    better = score < bscore
    for i in range(nx):
        x_ref[i:i + 1, :] = jnp.where(better, xs[i], bx[i])
    for c in range(C):
        s_ref[c] = jnp.where(better, S[c], bS[c])
        z_ref[c] = jnp.where(better, Z[c], bZ[c])


@functools.partial(jax.jit,
                   static_argnames=("iters", "tol", "interpret"))
def batched_ipm(c, Gp, hp, sx, sS, sZ, iters: int, tol: float,
                interpret: bool = False):
    """Solve B padded SOCPs: c (B, nx), Gp (B, C, d, nx), hp (B, C, d),
    start point (sx, sS, sZ).  Returns the best iterates (x, S, Z) with
    the same semantics as `_solve_padded_plain`.  f32, lane-major."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nx = c.shape
    _, C, d, _ = Gp.shape
    f32 = jnp.float32
    Bp = max(_round_up(B, CB), CB)

    def prep(a, nd):
        a = jnp.moveaxis(a.astype(f32), 0, -1)      # batch -> lanes
        pad = [(0, 0)] * (nd - 1) + [(0, Bp - B)]
        return jnp.pad(a, pad, mode="edge")         # replicate: stays solvable

    cT = prep(c, 2)
    GT = prep(Gp, 4)
    hT = prep(hp, 3)
    sxT = prep(sx, 2)
    sST = prep(sS, 3)
    sZT = prep(sZ, 3)

    grid = (Bp // CB,)
    spec = lambda *shape: pl.BlockSpec(shape + (CB,),
                                       lambda b: (0,) * len(shape) + (b,),
                                       memory_space=pltpu.VMEM)
    x, S, Z = pl.pallas_call(
        functools.partial(_ipm_kernel, nx, C, d, iters, tol),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((nx, Bp), f32),
                   jax.ShapeDtypeStruct((C, d, Bp), f32),
                   jax.ShapeDtypeStruct((C, d, Bp), f32)),
        in_specs=[spec(nx), spec(C, d, nx), spec(C, d),
                  spec(nx), spec(C, d), spec(C, d)],
        out_specs=(spec(nx), spec(C, d), spec(C, d)),
        interpret=interpret,
    )(cT, GT, hT, sxT, sST, sZT)
    out_dtype = c.dtype
    return (jnp.moveaxis(x[..., :B], -1, 0).astype(out_dtype),
            jnp.moveaxis(S[..., :B], -1, 0).astype(out_dtype),
            jnp.moveaxis(Z[..., :B], -1, 0).astype(out_dtype))
