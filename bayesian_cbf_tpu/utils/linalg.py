"""L0 linear-algebra substrate.

TPU-first replacements for the reference's torch utilities
(`bayes_cbf/misc.py:82-95` torch_kron, `bayes_cbf/control_affine_model.py:891-921`
make_psd / is_psd).  Everything here is pure, jittable and vmappable; the
Cholesky "jitter ladder" is expressed as a fixed-depth `lax.fori` sweep with
`where` selection instead of the reference's data-dependent Python retry loop,
so it compiles to a single static XLA program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kron(a: jax.Array, b: jax.Array) -> jax.Array:
    """Kronecker product of two matrices: (p, q) x (r, s) -> (p*r, q*s).

    Parity with the reference's ``torch_kron`` (bayes_cbf/misc.py:82-95)
    for the ``batch_dims=0`` case used on the hot path.
    """
    p, q = a.shape[-2], a.shape[-1]
    r, s = b.shape[-2], b.shape[-1]
    out = a[..., :, None, :, None] * b[..., None, :, None, :]
    return out.reshape(*a.shape[:-2], p * r, q * s)


def _chol_ok(L: jax.Array) -> jax.Array:
    """True iff the Cholesky factor is finite (jnp Cholesky yields NaN on
    non-PD input instead of raising)."""
    return jnp.all(jnp.isfinite(L))


def psd_cholesky(K: jax.Array,
                 init_jitter: float = 1e-6,
                 num_tries: int = 8,
                 growth: float = 10.0):
    """Cholesky with an in-graph jitter ladder.

    Replaces the reference's ``make_psd`` retry loop
    (bayes_cbf/control_affine_model.py:899-921) which perturbs the diagonal
    by growing random jitter until torch.cholesky succeeds.  Here we compute
    the factorization at a fixed ladder of deterministic jitters and select
    the first finite one, which keeps the graph static for jit/vmap.

    Returns (K_psd, L) where K_psd = K + jitter*I for the selected jitter and
    L is its lower Cholesky factor.
    """
    K = 0.5 * (K + K.swapaxes(-1, -2))
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    # scale-aware base jitter: relative to mean diagonal magnitude
    diag_scale = jnp.maximum(
        jnp.mean(jnp.abs(jnp.diagonal(K, axis1=-2, axis2=-1))), 1.0)
    # batched ladder: one (num_tries+1)-batched cholesky instead of a
    # sequential retry chain (TPU: a single kernel, not a latency chain)
    jitters = jnp.concatenate([
        jnp.zeros((1,), K.dtype),
        init_jitter * diag_scale * (growth ** jnp.arange(num_tries,
                                                         dtype=K.dtype))])
    Ks = K[None] + jitters[:, None, None] * eye
    Ls = jnp.linalg.cholesky(Ks)
    ok = jnp.all(jnp.isfinite(Ls), axis=(-2, -1))
    # index of the first successful factorization
    idx = jnp.argmax(ok)
    return Ks[idx], jnp.nan_to_num(Ls[idx])


def psd_clamp_eigh(K: jax.Array, eps: float = 0.0) -> jax.Array:
    """Project a symmetric matrix to the PSD cone by eigenvalue clamping.

    Replaces the reference's eigenvalue-repair of slightly-indefinite
    posterior Hessians (bayes_cbf/gp_algebra.py:384-392) and the symeig
    fallback in cone construction (bayes_cbf/controllers.py:525-531).
    """
    K = 0.5 * (K + K.swapaxes(-1, -2))
    w, v = jnp.linalg.eigh(K)
    w = jnp.maximum(w, eps)
    return (v * w[..., None, :]) @ v.swapaxes(-1, -2)


def masked_cholesky(K: jax.Array, mask: jax.Array,
                    init_jitter: float = 1e-6):
    """Cholesky of a Gram matrix restricted to ``mask``-valid rows/cols.

    Invalid rows and columns are replaced by identity rows so that the
    factorization has fixed shape (required for a fixed-shape lax.scan carry
    over a ring buffer of training points, SURVEY.md section 5.7).  Solves
    against the resulting factor are exact for the valid sub-block as long as
    the right-hand side is zero on invalid rows.

    Returns (K_masked, L).
    """
    m = mask.astype(K.dtype)
    outer = m[..., :, None] * m[..., None, :]
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    # identity on the invalid diagonal, zero elsewhere in invalid rows/cols
    Km = K * outer + eye * (1.0 - m)[..., :, None]
    return psd_cholesky(Km, init_jitter=init_jitter)


def chol_small_unrolled(K: jax.Array, jitter: float = 0.0):
    """Statically-unrolled Cholesky for SMALL trailing dims (n <= ~12).

    Same arithmetic as `cholesky`, but expressed as n(n+1)/2 scalar ops
    on the (...,)-batched entries: on TPU, `jnp.linalg.cholesky` of tiny
    matrices lowers to a latency-bound "Cholesky" custom-call — the
    round-3 profiler trace measured the 9-rung `psd_cholesky` ladder of
    the 3x3 task matrix A at ~700 us PER CALL inside the MLL fit loop
    (f32[256,9,3,3]), ~350 ms of a 1.6 s flagship window.  Unrolled, the
    whole factorization fuses into the surrounding elementwise chain.

    Semantics: symmetrize, add `jitter`*scale*I, clamp pivots at a tiny
    relative floor (never NaN).  For healthy PD inputs this is exactly
    the zero-rung ladder result; for indefinite noise it degrades by
    zeroing the offending pivot direction instead of escalating jitter
    — the PSD-projection behavior the cone builders want.  Returns the
    dense lower factor."""
    n = K.shape[-1]
    K = 0.5 * (K + K.swapaxes(-1, -2))
    diag_scale = jnp.maximum(
        jnp.mean(jnp.abs(jnp.diagonal(K, axis1=-2, axis2=-1)),
                 axis=-1), 1.0)
    # RELATIVE pivot floor: a clamped pivot divides the column below it,
    # so the floor must dominate the f32 roundoff noise of the column
    # (~eps * scale).  With pivot >= eps^2 * scale the off-diagonal
    # entries stay bounded by ~sqrt(scale) — an absolute floor (round-3
    # first attempt used finfo.tiny) lets a near-singular posterior Bk
    # produce sqrt(1e-38) divisors and ~1e12-wide cone factors, which
    # flipped the flagship learning outcome AND collapsed pendulum SOCP
    # feasibility to 0.24 before the on-chip gate caught it.
    eps = jnp.finfo(K.dtype).eps
    floor = (jnp.asarray(max(jitter, 0.0), K.dtype) + eps * eps) \
        * diag_scale
    if jitter:
        K = K + (jitter * diag_scale)[..., None, None] \
            * jnp.eye(n, dtype=K.dtype)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            acc = K[..., i, j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(acc, floor))
            else:
                L[i][j] = acc / L[j][j]
    zero = jnp.zeros_like(K[..., 0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else zero for j in range(n)],
                      axis=-1) for i in range(n)]
    return jnp.stack(rows, axis=-2)


def cho_solve_small_unrolled(L: jax.Array, B: jax.Array):
    """Solve (L L^T) X = B by statically-unrolled substitution.

    L (..., n, n) from `chol_small_unrolled`; B (..., n, m).  Companion
    to the unrolled factorization — no triangular-solve custom call."""
    n = L.shape[-1]
    y = [None] * n
    for i in range(n):
        acc = B[..., i, :]
        for k in range(i):
            acc = acc - L[..., i, k, None] * y[k]
        y[i] = acc / L[..., i, i, None]
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - L[..., k, i, None] * x[k]
        x[i] = acc / L[..., i, i, None]
    return jnp.stack(x, axis=-2)


def psd_chol_small_ladder(K: jax.Array, init_jitter: float = 1e-6,
                          num_tries: int = 8, growth: float = 10.0):
    """`psd_cholesky` semantics (scale-aware jitter ladder, first finite
    factorization wins) for SMALL trailing dims, with every rung a
    statically-unrolled scalar Cholesky — zero custom calls, fuses into
    the surrounding chain.

    Why the ladder semantics matter here (round-3 regression bisect):
    the CBC2 cone matrices and posterior row covariances are
    PSD-by-construction but f32-noise-indefinite in practice; a
    pivot-CLAMPED factorization emits spurious sqrt(scale)-sized factor
    entries in the near-null directions (cones far too wide -> pendulum
    SOCP feasibility collapsed 0.96 -> 0.26), while the ladder's
    escalated jitter yields a clean factor of a strictly-PD neighbor.
    Returns the dense lower factor of K + jitter*I for the selected
    rung (NaN-free by construction of the selection)."""
    n = K.shape[-1]
    K = 0.5 * (K + K.swapaxes(-1, -2))
    diag_scale = jnp.maximum(
        jnp.mean(jnp.abs(jnp.diagonal(K, axis1=-2, axis2=-1)),
                 axis=-1), 1.0)

    def attempt(jit_rel):
        Kj = K + (jit_rel * diag_scale)[..., None, None] \
            * jnp.eye(n, dtype=K.dtype)
        L = [[None] * n for _ in range(n)]
        ok = None
        for i in range(n):
            for j in range(i + 1):
                acc = Kj[..., i, j]
                for k in range(j):
                    acc = acc - L[i][k] * L[j][k]
                if i == j:
                    good = acc > 0
                    ok = good if ok is None else (ok & good)
                    # guard the sqrt/divisions so failed rungs stay
                    # finite (selection below discards them anyway)
                    L[i][j] = jnp.sqrt(jnp.maximum(
                        acc, jnp.finfo(K.dtype).tiny))
                else:
                    L[i][j] = acc / L[j][j]
        zero = jnp.zeros_like(Kj[..., 0, 0])
        rows = [jnp.stack([L[i][j] if j <= i else zero
                           for j in range(n)], axis=-1) for i in range(n)]
        return jnp.stack(rows, axis=-2), ok

    jitters = [0.0] + [init_jitter * growth ** r for r in range(num_tries)]
    Ls, oks = zip(*[attempt(jnp.asarray(j, K.dtype)) for j in jitters])
    # first successful rung wins; final rung is the unconditional fallback
    out = Ls[-1]
    for L, ok in zip(reversed(Ls[:-1]), reversed(oks[:-1])):
        out = jnp.where(ok[..., None, None], L, out)
    return out
