"""Pallas TPU kernel: batched blocked Cholesky with diagonal-block
inverses.

XLA's TPU `cholesky` and `triangular_solve` lower to latency-bound
blocked loops; at the flagship refit shape (batch=256, K=200) they
dominate the MLL Adam iteration (rollout-scale slope measurements,
PARITY.md).  This kernel factors a CHUNK of the batch at once so the
inner column recurrence is vectorized across the batch on the VPU
(every step is a full (CB, nb, nb) masked rank-1 update — no dynamic
slicing), and the panel/trailing block updates run on the MXU.  The
diagonal-block inverses are accumulated Gauss-Jordan style during the
factorization (same masked rank-1 ops), so no triangular solve appears
anywhere; the full L^{-1} is assembled outside the kernel from the
block inverses with batched matmuls.

Layout: N padded to a multiple of nb=128 with identity diagonal
(Cholesky of blockdiag(A, I) = blockdiag(chol A, I)); batch padded to a
multiple of the chunk CB.  f32 only (the TPU fast path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Linv assembly form: "kernel" (default, round 4) assembles the
# triangular inverse INSIDE the Pallas kernel on VMEM values — accurate
# at large n x high kappa where the XLA-side forms are not (n=1024,
# kappa 2.7e6: resid 0.031 vs 38-50; records k1024_refresh_assembly_ab)
# and free of per-call L/Dinv HBM round-trips.  "row" builds block row
# r on the XLA side with TWO large batched matmuls (valid because
# Linv[k, j] = 0 above the diagonal, so summing k over the FULL 0..r-1
# range equals the triangular-substitution range); "col" is the legacy
# per-(r, j) block substitution (an O(nblocks^2) dispatch storm).  Same
# math, different association; numerics-gated like any fit-path change.
LINV_ASSEMBLY = "kernel"

NB_BLK = 32       # factorization block.  On-chip fused-fit A/B at the
                  # flagship shape (B=256, k=200): nb=32 9.7 ms/Adam-iter
                  # vs nb=64 12.0 vs nb=128 12.2 (records fit_chol_nb_ab)
                  # — the serial in-block pivot loop's VPU cost scales
                  # with the block's SUBLANE footprint (the sweep-kernel
                  # lesson), so smaller blocks win until the blocked
                  # trailing updates dominate.  CPU-interpret resid on
                  # the real trajectory Gram: 4.0e-3 (nb=32).
CHUNK = 8         # max batch elements factored together per grid cell
CHOLSOLVE_CHUNK = 32  # factor+solve kernels: same sweet spot as cholk (cholinv.CHOLK_CHUNK)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _factor_block(D, tiny):
    """Vectorized-over-batch unblocked Cholesky of (CB, nb, nb) PSD blocks
    plus their inverses, via masked full-width rank-1 updates (no dynamic
    slicing — TPU-friendly)."""
    CB, nb, _ = D.shape
    f32 = D.dtype
    ri = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)      # row index
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)      # col index
    X0 = (ri == ci.reshape(nb, 1).T).astype(f32)              # I (nb, nb)
    X0 = jnp.broadcast_to(X0[None], (CB, nb, nb))

    def body(i, carry):
        M, X = carry
        onehot_c = (ci == i).astype(f32)                      # (1, nb)
        onehot_r = (ri == i).astype(f32)                      # (nb, 1)
        # current column i and pivot
        # Mosaic layout constraints: no rank-1 arrays and no axis=(1,2)
        # double reductions — compute the pivot via two single-axis
        # masked reductions with rsqrt applied on a full row
        rowi = jnp.sum(M * onehot_r[None], axis=1,
                       keepdims=True)                         # (CB, 1, nb)
        inv_row = jax.lax.rsqrt(jnp.maximum(rowi, tiny))
        inv_s = jnp.sum(inv_row * onehot_c[None], axis=2,
                        keepdims=True)                        # (CB, 1, 1)
        col = jnp.sum(M * onehot_c[None], axis=2,
                      keepdims=True)                          # (CB, nb, 1)
        col = col * inv_s
        Lcol = col * (ri >= i).astype(f32)[None]              # (CB, nb, 1)
        # the factored block stays symmetric to roundoff, so row i IS
        # column i: build the row factor from the direct row read
        # instead of transposing Lcol — a per-pivot sublane<->lane
        # swapaxes was a measured VPU sink (round-4 fit profile)
        LcolT = (rowi * inv_s) * (ci >= i).astype(f32)[None]  # (CB, 1, nb)
        gt_c = (ci > i).astype(f32)                           # (1, nb)
        # trailing rank-1 update on columns > i, then write column i = Lcol
        M = M - Lcol * LcolT * gt_c[None]
        M = M * (1.0 - onehot_c)[None] + Lcol * onehot_c[None]
        # Gauss-Jordan inverse: scale row i, eliminate rows > i
        Xrow = jnp.sum(X * onehot_r[None], axis=1, keepdims=True)  # (CB,1,nb)
        Xrow = Xrow * inv_s
        X = X * (1.0 - onehot_r)[None] + Xrow * onehot_r[None]
        strict = Lcol * (ri > i).astype(f32)[None]
        X = X - strict * Xrow
        return M, X

    M, X = jax.lax.fori_loop(0, nb, body, (D, X0))
    tril = (ri >= ci.reshape(nb, 1).T).astype(f32)
    return M * tril[None], X


def _chol_kernel(nblocks, nb, k_ref, l_ref, dinv_ref):
    """Grid cell: factor a (CB, N, N) chunk; write L and the (CB, N, nb)
    stack of diagonal-block inverses."""
    f32 = k_ref.dtype
    tiny = jnp.full((1, 1, 1), 1e-12, f32)
    W = k_ref[:]                                              # (CB, N, N)
    l_ref[:] = jnp.zeros_like(W)

    def bmm(a, b, transpose_b=False):
        dims = (((2,), (2 if transpose_b else 1,)), ((0,), (0,)))
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    for j in range(nblocks):
        o = j * nb
        # W holds the (shrinking) trailing matrix — no in-place updates,
        # which Mosaic would lower as scatters
        D = W[:, :nb, :nb]
        Lj, Xj = _factor_block(D, tiny)
        l_ref[:, o:o + nb, o:o + nb] = Lj
        dinv_ref[:, o:o + nb, :] = Xj
        if j + 1 < nblocks:
            P = W[:, nb:, :nb]                                # (CB, r, nb)
            Lp = bmm(P, Xj, transpose_b=True)                 # P @ Xj^T
            l_ref[:, o + nb:, o:o + nb] = Lp
            W = W[:, nb:, nb:] - bmm(Lp, Lp, transpose_b=True)


def _bmm(a, b, ta=False, tb=False):
    dims = (((1 if ta else 2,), (2 if tb else 1,)), ((0,), (0,)))
    return jax.lax.dot_general(a, b, dimension_numbers=dims,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _factor_assemble(W, nblocks, nb, N, n, l_ref=None):
    """Shared body: blocked factorization of a (CB, n|N, n|N) VMEM value
    + row-form Linv assembly on values.  Returns (top = Linv (CB, N, N),
    ld (CB, 1, 1)).  When l_ref is given, the L pieces are written into
    it during the loop (the refresh path wants the factor too)."""
    f32 = W.dtype
    tiny = jnp.full((1, 1, 1), 1e-12, f32)
    CB = W.shape[0]
    if W.shape[1] < N:
        from .pallas_sweep import _identity_pad
        W = _identity_pad(W, N, W.shape[1])
    ri = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    eye_nb = (ri == ci.reshape(nb, 1).T).astype(f32)
    ld = jnp.zeros((CB, 1, 1), f32)
    lps = []
    xs = []
    for j in range(nblocks):
        o = j * nb
        D = W[:, :nb, :nb]
        Lj, Xj = _factor_block(D, tiny)
        diag = jnp.sum(Lj * eye_nb[None], axis=2, keepdims=True)
        ld = ld + 2.0 * jnp.sum(
            jnp.log(jnp.maximum(diag, jnp.full_like(diag, 1e-20))),
            axis=1, keepdims=True)
        xs.append(Xj)
        if l_ref is not None:
            l_ref[:, o:o + nb, o:o + nb] = Lj
        if j + 1 < nblocks:
            P = W[:, nb:, :nb]
            Lp = _bmm(P, Xj, tb=True)
            lps.append(Lp)
            if l_ref is not None:
                l_ref[:, o + nb:, o:o + nb] = Lp
            W = W[:, nb:, nb:] - _bmm(Lp, Lp, tb=True)
        else:
            lps.append(None)
    top = xs[0]
    for r in range(1, nblocks):
        Lrow = jnp.concatenate(
            [lps[j][:, (r - j - 1) * nb:(r - j) * nb, :]
             for j in range(r)], axis=2)
        new = -_bmm(xs[r], _bmm(Lrow, top))
        o = r * nb
        top = jnp.concatenate([
            jnp.concatenate([top, jnp.zeros((CB, o, nb), f32)], axis=2),
            jnp.concatenate([new, xs[r]], axis=2)], axis=1)
    return top, ld


def _chol_linv_kernel(nblocks, nb, n, N, k_ref, l_ref, linv_ref):
    """Grid cell for the REFRESH path: (L, Linv) with the triangular
    inverse assembled IN-kernel on VMEM values — the XLA-side row
    assembly loses accuracy at large n x high kappa (measured n=1024:
    resid 38-50 vs 0.031 in-kernel; records k1024_refresh_assembly_ab)
    and pays per-call HBM round-trips."""
    l_ref[:] = jnp.zeros_like(l_ref)
    top, _ = _factor_assemble(k_ref[:], nblocks, nb, N, n, l_ref=l_ref)
    linv_ref[:] = top[:, :n, :n]


def _cholkinv_kernel(nblocks, nb, n, N, k_ref, kinv_ref, ld_ref):
    """Grid cell: (K^{-1}, logdet K) of a (CB, N, N) chunk ENTIRELY in
    VMEM — blocked Cholesky factorization, row-form Linv assembly on
    values (see _factor_assemble), Kinv = Linv^T Linv as one MXU matmul,
    logdet from the factor diagonals.  Same arithmetic as the
    `batched_chol_with_inv` kernel + the XLA-side row assembly it
    previously required, but the L/Dinv blocks never round-trip through
    HBM and the nblocks-1 assembly steps cost VMEM copies instead of
    dispatched XLA concats — which is what made small nb lose before
    (records fit_chol_nb_small_ab: the nb=8 serial factor loop is
    cheap, the XLA assembly at 24 blocks wasn't)."""
    top, ld = _factor_assemble(k_ref[:], nblocks, nb, N, n)
    Kinv = _bmm(top, top, ta=True)                            # Linv^T Linv
    kinv_ref[:] = Kinv[:, :n, :n]
    ld_ref[:] = jnp.broadcast_to(ld, ld_ref.shape)


def _solve_sweeps(lps, xs, rhs, nblocks, nb):
    """Two triangular sweeps against the blocked factor held as VMEM
    values: forward  y_r = X_r (b_r - sum_{j<r} L[r,j] y_j), backward
    x_r = X_r^T (y_r - sum_{j>r} L[j,r]^T x_j).  L[r,j] for j<r lives in
    the panel value lps[j] at block-row offset (r-j-1); X_r = xs[r] is
    the diagonal-block inverse.  rhs: (CB, N, R)."""
    ys = []
    for r in range(nblocks):
        acc = rhs[:, r * nb:(r + 1) * nb, :]
        for j in range(r):
            Lrj = lps[j][:, (r - j - 1) * nb:(r - j) * nb, :]
            acc = acc - _bmm(Lrj, ys[j])
        ys.append(_bmm(xs[r], acc))
    sols = [None] * nblocks
    for r in range(nblocks - 1, -1, -1):
        acc = ys[r]
        for j in range(r + 1, nblocks):
            Ljr = lps[r][:, (j - r - 1) * nb:(j - r) * nb, :]
            acc = acc - _bmm(Ljr, sols[j], ta=True)
        sols[r] = _bmm(xs[r], acc, ta=True)
    return jnp.concatenate(sols, axis=1)


def _cholsolve_kernel(nblocks, nb, n, N, k_ref, rhs_ref, sol_ref, l_ref,
                      dinv_ref, ld_ref):
    """Grid cell for the Hutchinson fit path FORWARD: blocked Cholesky
    factor + two-sweep solve of a (CB, N, R) right-hand side + logdet —
    NO Linv assembly and NO Kinv = Linv^T Linv bmm (the two non-factor
    phases of `_cholkinv_kernel`, whose per-block-column VPU/MXU work
    scales with the FULL n column width; the sweeps touch only R
    columns).  Writes L and the diagonal-block inverses so the backward
    pass can solve its cotangent rhs without refactoring."""
    f32 = k_ref.dtype
    tiny = jnp.full((1, 1, 1), 1e-12, f32)
    W = k_ref[:]
    CB = W.shape[0]
    l_ref[:] = jnp.zeros_like(W)
    ri = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    eye_nb = (ri == ci.reshape(nb, 1).T).astype(f32)
    ld = jnp.zeros((CB, 1, 1), f32)
    lps, xs = [], []
    for j in range(nblocks):
        o = j * nb
        D = W[:, :nb, :nb]
        Lj, Xj = _factor_block(D, tiny)
        diag = jnp.sum(Lj * eye_nb[None], axis=2, keepdims=True)
        ld = ld + 2.0 * jnp.sum(
            jnp.log(jnp.maximum(diag, jnp.full_like(diag, 1e-20))),
            axis=1, keepdims=True)
        xs.append(Xj)
        l_ref[:, o:o + nb, o:o + nb] = Lj
        dinv_ref[:, o:o + nb, :] = Xj
        if j + 1 < nblocks:
            P = W[:, nb:, :nb]
            Lp = _bmm(P, Xj, tb=True)
            lps.append(Lp)
            l_ref[:, o + nb:, o:o + nb] = Lp
            W = W[:, nb:, nb:] - _bmm(Lp, Lp, tb=True)
        else:
            lps.append(None)
    sol_ref[:] = _solve_sweeps(lps, xs, rhs_ref[:], nblocks, nb)
    ld_ref[:] = jnp.broadcast_to(ld, ld_ref.shape)


def _solve_with_factor_kernel(nblocks, nb, l_ref, dinv_ref, rhs_ref,
                              sol_ref):
    """Grid cell for the Hutchinson fit path BACKWARD: two-sweep solve
    of a (CB, N, R) rhs against the SAVED factor (L panels + diag-block
    inverses are kernel INPUTS — reading inputs is fine; the round-2
    negative result was OUTPUT-ref readback)."""
    L = l_ref[:]
    D = dinv_ref[:]
    lps, xs = [], []
    for j in range(nblocks):
        o = j * nb
        xs.append(D[:, o:o + nb, :])
        lps.append(L[:, o + nb:, o:o + nb] if j + 1 < nblocks else None)
    sol_ref[:] = _solve_sweeps(lps, xs, rhs_ref[:], nblocks, nb)


@functools.partial(jax.jit, static_argnames=("interpret", "nb", "chunk"))
def batched_cholsolve_logdet(K, RHS, interpret: bool = False, nb: int = 0,
                             chunk: int = 0):
    """(K^{-1} RHS, L, Dinv, logdet K) for a batch K (B, n, n) and rhs
    (B, n, r) via ONE Pallas call — the factor-and-solve forward of the
    Hutchinson fit path (no Linv assembly / Kinv bmm)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = int(nb) if nb else NB_BLK
    B, n, _ = K.shape
    r = RHS.shape[-1]
    N = max(_round_up(n, nb), nb)
    nblocks = N // nb
    from .pallas_sweep import _auto_chunk, VMEM_LIMIT
    chunk = min(chunk or CHOLSOLVE_CHUNK,
                _auto_chunk(N, extra_bytes_per_elem=N * N))
    Bp = max(_round_up(B, chunk), chunk)
    f32 = jnp.float32
    Kp = K.astype(f32)
    Rp = RHS.astype(f32)
    if Bp != B:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=f32), (Bp - B, n, n))
        Kp = jnp.concatenate([Kp, eye], axis=0)
        Rp = jnp.concatenate(
            [Rp, jnp.zeros((Bp - B, n, r), f32)], axis=0)
    if N != n:
        from .pallas_sweep import _identity_pad
        Kp = _identity_pad(Kp, N, n)
        Rp = jnp.concatenate(
            [Rp, jnp.zeros((Bp, N - n, r), f32)], axis=1)

    grid = (Bp // chunk,)
    sol, L, Dinv, ld = pl.pallas_call(
        functools.partial(_cholsolve_kernel, nblocks, nb, n, N),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((Bp, N, r), f32),
                   jax.ShapeDtypeStruct((Bp, N, N), f32),
                   jax.ShapeDtypeStruct((Bp, N, nb), f32),
                   jax.ShapeDtypeStruct((Bp, 1, 128), f32)),
        in_specs=[pl.BlockSpec((chunk, N, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((chunk, N, r), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((chunk, N, r), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((chunk, N, N), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((chunk, N, nb), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((chunk, 1, 128), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(Kp, Rp)
    return (sol[:B, :n].astype(K.dtype), L[:B], Dinv[:B],
            ld[:B, 0, 0].astype(K.dtype))


@functools.partial(jax.jit, static_argnames=("interpret", "nb", "chunk"))
def batched_solve_with_factor(L, Dinv, RHS, interpret: bool = False,
                              nb: int = 0, chunk: int = 0):
    """K^{-1} RHS against a factor saved by `batched_cholsolve_logdet`
    (L (B, N, N) padded, Dinv (B, N, nb)); rhs (B, n, r)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = int(nb) if nb else NB_BLK
    B, N, _ = L.shape
    n = RHS.shape[1]
    r = RHS.shape[-1]
    nblocks = N // nb
    from .pallas_sweep import _auto_chunk, VMEM_LIMIT
    chunk = min(chunk or CHOLSOLVE_CHUNK,
                _auto_chunk(N, extra_bytes_per_elem=N * N))
    Bp = max(_round_up(B, chunk), chunk)
    f32 = jnp.float32
    Lp_ = L.astype(f32)
    Dp = Dinv.astype(f32)
    Rp = RHS.astype(f32)
    if N != n:
        Rp = jnp.concatenate(
            [Rp, jnp.zeros((B, N - n, r), f32)], axis=1)
    if Bp != B:
        eyeN = jnp.broadcast_to(jnp.eye(N, dtype=f32), (Bp - B, N, N))
        Lp_ = jnp.concatenate([Lp_, eyeN], axis=0)
        eye_blk = jnp.broadcast_to(
            jnp.tile(jnp.eye(nb, dtype=f32), (N // nb, 1))[None],
            (Bp - B, N, nb))
        Dp = jnp.concatenate([Dp, eye_blk], axis=0)
        Rp = jnp.concatenate(
            [Rp, jnp.zeros((Bp - B, N, r), f32)], axis=0)

    grid = (Bp // chunk,)
    sol = pl.pallas_call(
        functools.partial(_solve_with_factor_kernel, nblocks, nb),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((Bp, N, r), f32),
        in_specs=[pl.BlockSpec((chunk, N, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((chunk, N, nb), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((chunk, N, r), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, N, r), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(Lp_, Dp, Rp)
    return sol[:B, :n].astype(RHS.dtype)


def batched_kinv_logdet_chol(K, interpret: bool = False, nb: int = 0,
                             chunk: int = 0):
    """(K^{-1}, logdet K) for a batch K (B, n, n) of PSD matrices via ONE
    Pallas call (factor + Linv assembly + Linv^T Linv all in VMEM); f32.
    The FIT_INVERSE="cholk" path: Cholesky-class stability on the
    trajectory-correlated fit Grams (the trailing updates are identical
    to `batched_chol_with_inv`'s) without that path's per-Adam-iteration
    L/Dinv HBM round-trips and XLA assembly dispatches.  nb/chunk are
    call-time args (trace-time global reads burned a round-3 A/B)."""
    nb = int(nb) if nb else NB_BLK
    return _batched_kinv_logdet_chol_jit(K, interpret, nb, int(chunk))


@functools.partial(jax.jit, static_argnames=("interpret", "nb", "chunk"))
def _batched_kinv_logdet_chol_jit(K, interpret: bool, nb: int, chunk: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = K.shape
    N = max(_round_up(n, nb), nb)
    nblocks = N // nb
    from .pallas_sweep import _auto_chunk, VMEM_LIMIT
    # true peak ~7.5x N^2 f32 per element: in/out double-buffered (4x) +
    # the live W / panel list / growing Linv / Kinv values (~3.5x) — the
    # base 7x in _auto_chunk covers most of it, so only a small extra.
    # chunk matters a lot here: total serial-pivot overhead scales with
    # GRID CELLS x pivots, so halving cells nearly halves the VPU wall
    chunk = min(chunk or CHUNK, _auto_chunk(N, extra_bytes_per_elem=N * N))
    Bp = max(_round_up(B, chunk), chunk)
    f32 = jnp.float32

    Kp = K.astype(f32)
    if Bp != B:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=f32), (Bp - B, n, n))
        Kp = jnp.concatenate([Kp, eye], axis=0)

    grid = (Bp // chunk,)
    Kinv, ld = pl.pallas_call(
        functools.partial(_cholkinv_kernel, nblocks, nb, n, N),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((Bp, n, n), f32),
                   jax.ShapeDtypeStruct((Bp, 1, 128), f32)),
        in_specs=[pl.BlockSpec((chunk, n, n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((chunk, n, n), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((chunk, 1, 128), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(Kp)
    return (Kinv[:B].astype(K.dtype), ld[:B, 0, 0].astype(K.dtype))


def batched_chol_with_inv(K, interpret: bool = False, nb: int = 0,
                          chunk: int = 0, assembly: str = ""):
    """(L, Linv) for a batch K (B, n, n) of PSD matrices via the Pallas
    factorization kernel; f32.  Returns exactly lower-triangular factors.

    nb=0 picks NB_BLK; chunk=0 picks CHUNK (both still clamped by the
    VMEM budget).  The serial per-column factor loop's VPU cost
    scales with the (CB, nb, nb) SUBLANE footprint while the column
    count stays ~n, so smaller blocks cut the serial phase near-linearly
    at the price of more (and lane-padded, below 128) block matmuls in
    the trailing updates and the Linv assembly.  Resolved here OUTSIDE
    jit (trace-time global reads made same-shape A/Bs reuse the first
    trace — the round-3 sweep-base confound)."""
    nb = int(nb) if nb else NB_BLK
    assembly = assembly or LINV_ASSEMBLY
    if assembly == "kernel":
        return _batched_chol_linv_kernel_jit(K, interpret, nb, int(chunk))
    return _batched_chol_with_inv_jit(K, interpret, nb, int(chunk),
                                      assembly)


@functools.partial(jax.jit, static_argnames=("interpret", "nb", "chunk"))
def _batched_chol_linv_kernel_jit(K, interpret: bool, nb: int, chunk: int):
    """(L, Linv) with the triangular-inverse assembly IN-kernel on VMEM
    values (assembly="kernel"): accurate where the XLA-side row form
    is not (n=1024 x kappa 2.7e6: resid 0.031 vs 38-50; records
    k1024_refresh_assembly_ab) and free of the per-call L/Dinv HBM
    round-trips."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = K.shape
    N = max(_round_up(n, nb), nb)
    nblocks = N // nb
    from .pallas_sweep import _auto_chunk, VMEM_LIMIT
    chunk = min(chunk or CHUNK, _auto_chunk(N, extra_bytes_per_elem=N * N))
    Bp = max(_round_up(B, chunk), chunk)
    f32 = jnp.float32

    Kp = K.astype(f32)
    if Bp != B:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=f32), (Bp - B, n, n))
        Kp = jnp.concatenate([Kp, eye], axis=0)

    grid = (Bp // chunk,)
    L, Linv = pl.pallas_call(
        functools.partial(_chol_linv_kernel, nblocks, nb, n, N),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((Bp, N, N), f32),
                   jax.ShapeDtypeStruct((Bp, n, n), f32)),
        in_specs=[pl.BlockSpec((chunk, n, n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((chunk, N, N), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((chunk, n, n), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(Kp)
    return (L[:B, :n, :n].astype(K.dtype), Linv[:B].astype(K.dtype))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "nb", "chunk", "assembly"))
def _batched_chol_with_inv_jit(K, interpret: bool, nb: int, chunk: int,
                               assembly: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = K.shape
    N = max(_round_up(n, nb), nb)
    nblocks = N // nb
    # chunk shrinks with N so the in/L/Dinv double-buffered blocks stay
    # inside the raised scoped-vmem budget (extends coverage to n=512;
    # the old failure there was the default 16M budget)
    from .pallas_sweep import _auto_chunk, VMEM_LIMIT
    chunk = min(chunk or CHUNK,
                _auto_chunk(N, extra_bytes_per_elem=4 * N * nb))
    Bp = max(_round_up(B, chunk), chunk)
    f32 = jnp.float32

    Kp = jnp.zeros((Bp, N, N), f32)
    Kp = Kp.at[:, jnp.arange(N), jnp.arange(N)].set(1.0)      # identity pad
    Kp = Kp.at[:B, :n, :n].set(K.astype(f32))

    grid = (Bp // chunk,)
    L, Dinv = pl.pallas_call(
        functools.partial(_chol_kernel, nblocks, nb),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((Bp, N, N), f32),
                   jax.ShapeDtypeStruct((Bp, N, nb), f32)),
        in_specs=[pl.BlockSpec((chunk, N, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((chunk, N, N), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((chunk, N, nb), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(Kp)

    if assembly == "row" and nblocks > 1:
        # row form: two LARGE batched matmuls per block row.  Because
        # Linv[k, j] = 0 for k < j, summing k over the full 0..r-1
        # range reproduces the triangular substitution exactly:
        #   Linv[r, :r] = -Dinv_r @ (L[r, :r·nb] @ Linv[:r·nb, :r·nb])
        # nblocks-1 serial steps of MXU-shaped work replace the legacy
        # O(nblocks^2) lane-padded (B, nb, nb) dispatch storm.
        top = Dinv[:, :nb, :]                                 # (Bp, nb, nb)
        for r in range(1, nblocks):
            o = r * nb
            Lrow = L[:, o:o + nb, :o]                         # (Bp, nb, o)
            new = -(Dinv[:, o:o + nb, :] @ (Lrow @ top))      # (Bp, nb, o)
            top = jnp.concatenate([
                jnp.concatenate([top, jnp.zeros((Bp, o, nb), f32)], 2),
                jnp.concatenate([new, Dinv[:, o:o + nb, :]], 2)], 1)
        Linv = top
    else:
        # legacy column form (per-(r, j) block substitution) — kept for
        # on-chip A/B of the assembly rewrite
        blocks = [[None] * nblocks for _ in range(nblocks)]
        for j in range(nblocks):
            blocks[j][j] = Dinv[:, j * nb:(j + 1) * nb, :]
        for r in range(nblocks):
            for j in range(r - 1, -1, -1):
                acc = 0.0
                for k in range(j, r):
                    acc = acc + L[:, r * nb:(r + 1) * nb,
                                  k * nb:(k + 1) * nb] @ blocks[k][j]
                blocks[r][j] = -(blocks[r][r] @ acc)
        zero = jnp.zeros((Bp, nb, nb), f32)
        Linv = jnp.concatenate(
            [jnp.concatenate([blocks[r][j] if j <= r else zero
                              for j in range(nblocks)], axis=2)
             for r in range(nblocks)], axis=1)
    return (L[:B, :n, :n].astype(K.dtype),
            Linv[:B, :n, :n].astype(K.dtype))
