"""Pallas TPU kernel: batched PD inverse + logdet via recursive Schur
complements with sweep-operator base blocks.

Why this exists: the MLL refit consumes the Gram ONLY through K^{-1} Y
and logdet K (see `ops.cholinv.solve_and_logdet`), and on chip the
batched (256, 200, 200) Cholesky-with-inverse costs ~12.4 ms per Adam
iteration — 62% of the flagship bench wall across the 4 scheduled
refits.  A triangular factor is never needed, so this kernel computes
(K^{-1}, logdet K) directly:

  * recursion: inv([[A, B], [B^T, C]]) via the Schur complement
    S = C - B^T A^{-1} B,

        Kinv = [[Ainv + W Sinv W^T, -W Sinv],
                [-(W Sinv)^T,        Sinv  ]],   W = Ainv B,

    logdet K = logdet A + logdet S.  Every combination step is a
    (CB, h, h) MXU batched matmul on VMEM-resident values; PD-ness of A
    and S is inherited from K, so no pivoting is needed (same stability
    class as Cholesky-based inversion, protected by the Gram jitter).
  * base case (size-dependent, see _pick_base): the symmetric sweep
    operator — base-many masked rank-1 steps vectorized over the batch
    chunk; after sweeping all pivots M -> -M^{-1}, and the pivots d_i
    are the successive conditional variances, so logdet = sum log d_i.

Batch is padded to the CHUNK grid; N is padded to the next multiple of
the base with an identity diagonal (inverse and logdet of
blockdiag(K, I) restrict trivially).  The identity padding happens
INSIDE the kernel on the loaded VMEM value: materializing the padded
matrix on the XLA side was a measured 0.68 ms/Adam-iteration
dynamic-update-slice (a 67 MB HBM round-trip per fit step at
(256, 200->256), round-3 trace), and rounding 200 up to a power of two
inflated every HBM stream and combine matmul by a further 1.3x.  The
recursion handles any multiple-of-base size by splitting at the
half-rounded-to-base boundary.  f32 only (the TPU fast path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Sweep-operator base block.  The serial pivot loop's per-op VPU cost
# scales with the SUBLANE footprint of a (CB, BASE, BASE) masked update
# (lanes pad to 128 regardless), while the pivot COUNT is always n —
# so smaller bases cut sweep cycles almost linearly until the deeper
# combine tree's small-matmul dispatch overhead wins.  Measured
# ms/inversion (in-scan marginal, one process, round 3):
#   (256, 200): BASE 32/16/8 = 2.87 / 1.99 / 1.71
#   (64, 512):  BASE 16/8    = 1.91 / 2.58
# so the base is size-dependent: 8 up to n<=256 (also makes k=200 pad
# to 200 exactly), 16 above.  Residual/logdet accuracy is identical
# across bases (conditioning-dominated).
BASE_SMALL = 8
BASE_LARGE = 16
_BASE_SWITCH_N = 256
# legacy alias: tests/benches that monkeypatch a single block size set
# this; _pick_base honors it when not None
BASE = None


def _pick_base(n):
    if BASE is not None:
        return BASE
    return BASE_SMALL if n <= _BASE_SWITCH_N else BASE_LARGE


# max batch elements per grid cell (chunk=0 auto-selects).  Round-3
# in-process A/B at (256, 200, 200): chunk 8/16/32 = 4.82/4.41/4.22 ms
# with the raised vmem budget (the round-2 "anything above 8 OOMs"
# finding was an artifact of the default 16M scoped budget, fixed by
# CompilerParams.vmem_limit_bytes below).
CHUNK = 32
# scoped-VMEM ceiling passed to Mosaic (v5e has 128M); block selection
# below keeps in+out double-buffered blocks under this with margin
VMEM_LIMIT = 100 * 1024 * 1024


def _auto_chunk(N, extra_bytes_per_elem=0):
    """Largest power-of-two chunk <= CHUNK whose scoped-VMEM footprint
    fits the budget (enables n up to 512: the old hard n<=256 cap was
    the default 16M scoped budget, not hardware).  The per-element cost
    is ~7x N^2 f32: in+out double-buffered (4x) plus the Schur
    recursion's live intermediates (measured 5.9x total at N=384 from
    the Mosaic scoped-alloc error; 7x leaves margin)."""
    per = 7 * N * N * 4 + 2 * extra_bytes_per_elem
    c = max(1, min(CHUNK, int(0.8 * VMEM_LIMIT) // per))
    while c & (c - 1):
        c &= c - 1
    return c


def _round_up(x, m):
    return (x + m - 1) // m * m


def _padded_size(n, base=None):
    """Smallest multiple of the (size-dependent) base >= n.  The recursion
    splits any block count at floor(half) blocks, so no power-of-two
    constraint."""
    base = base or _pick_base(n)
    return max(_round_up(n, base), base)


def _sweep_block(M, tiny):
    """Sweep all pivots of (CB, nb, nb) PD blocks: returns (Minv,
    logdet (CB, 1, 1)).  Masked full-width rank-1 updates, batch on the
    leading dim (no dynamic slicing — TPU-friendly).

    Sweep step at pivot i (d = M[i, i]):
        M[j, k] -= M[j, i] M[i, k] / d    (j != i, k != i)
        M[i, k] /= d ;  M[j, i] /= d ;  M[i, i] = -1/d
    After all i: M == -K^{-1}."""
    CB, nb, _ = M.shape
    f32 = M.dtype
    ri = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    ld0 = jnp.zeros((CB, 1, 1), f32)

    def body(i, carry):
        M, ld = carry
        onehot_c = (ci == i).astype(f32)                      # (1, nb)
        onehot_r = (ri == i).astype(f32)                      # (nb, 1)
        # pivot d = M[i, i] via two single-axis masked reductions
        # (Mosaic: no rank-1 arrays, no double reductions)
        rowi = jnp.sum(M * onehot_r[None], axis=1,
                       keepdims=True)                         # (CB, 1, nb)
        d = jnp.sum(rowi * onehot_c[None], axis=2,
                    keepdims=True)                            # (CB, 1, 1)
        d = jnp.maximum(d, tiny)
        idv = 1.0 / d
        ld = ld + jnp.log(d)
        srow = rowi * idv                                     # (CB, 1, nb)
        coli = jnp.sum(M * onehot_c[None], axis=2,
                       keepdims=True)                         # (CB, nb, 1)
        # rank-1 elimination everywhere except row i / col i.  (A
        # "cheaper" unmasked-rank-1 + masked-adds variant was measured
        # NOT faster — the VPU time here is reduction/loop-bound, not
        # blend-bound — and it costs ~30x logdet precision because the
        # cancellation residue on row/col i feeds later pivots.)
        upd = M - coli * srow
        keep_rc = (1.0 - onehot_r) * (1.0 - onehot_c)         # (nb, nb)
        M = upd * keep_rc[None] \
            + (srow * onehot_r[None]) * (1.0 - onehot_c)[None] \
            + (coli * idv * onehot_c[None]) * (1.0 - onehot_r)[None] \
            - idv * (onehot_r * onehot_c)[None]
        return M, ld

    M, ld = jax.lax.fori_loop(0, nb, body, (M, ld0))
    return -M, ld


def _bmm(a, b, ta=False, tb=False):
    dims = (((1 if ta else 2,), (2 if tb else 1,)), ((0,), (0,)))
    # HIGHEST: Mosaic would otherwise run bf16 MXU passes; the Schur
    # recursion squares errors, so the combine matmuls stay exact f32
    return jax.lax.dot_general(a, b, dimension_numbers=dims,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _inv_logdet(M, n, tiny, base):
    """(inverse VALUE, logdet) of an (n, n) PD block value.  Results
    stay VALUES throughout the recursion: reading back partial
    results from the output ref serializes Mosaic's pipeline
    (measured 9x slower), so the output ref is written exactly once."""
    if n == base:
        return _sweep_block(M, tiny)
    # split at floor(half) rounded to the base grid (handles any
    # multiple-of-base size, e.g. 224 -> 96 + 128 at base 32)
    h = (n // (2 * base)) * base
    A = M[:, :h, :h]
    B = M[:, :h, h:]
    C = M[:, h:, h:]
    Ainv, ld1 = _inv_logdet(A, h, tiny, base)
    W = _bmm(Ainv, B)                                 # (CB, h, n-h)
    S = C - _bmm(B, W, ta=True)
    Sinv, ld2 = _inv_logdet(S, n - h, tiny, base)
    WS = _bmm(W, Sinv)                                # (CB, h, h)
    TL = Ainv + _bmm(WS, W, tb=True)
    top = jnp.concatenate([TL, -WS], axis=2)
    bot = jnp.concatenate([-jnp.swapaxes(WS, 1, 2), Sinv], axis=2)
    return jnp.concatenate([top, bot], axis=1), ld1 + ld2


def _identity_pad(M, N, n):
    """Pad (CB, n, n) -> (CB, N, N) with an identity tail INSIDE the
    kernel (cheap one-time VMEM concats; the padding rows contribute
    log det I = 0 and an identity inverse block, discarded by the
    sliced output write)."""
    f32 = M.dtype
    CB = M.shape[0]
    pad = N - n
    M = jnp.concatenate([M, jnp.zeros((CB, pad, n), f32)], axis=1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (N, pad), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (N, pad), 1)
    tail = (ri == ci + n).astype(f32)                # (N, pad) eye tail
    return jnp.concatenate(
        [M, jnp.broadcast_to(tail[None], (CB, N, pad))], axis=2)


def _kernel(N, n, base, k_ref, kinv_ref, ld_ref):
    f32 = k_ref.dtype
    tiny = jnp.full((1, 1, 1), 1e-12, f32)
    M = k_ref[:]
    if n < N:
        M = _identity_pad(M, N, n)
    Kinv, ld = _inv_logdet(M, N, tiny, base)
    kinv_ref[:] = Kinv[:, :n, :n]
    ld_ref[:] = jnp.broadcast_to(ld, ld_ref.shape)


def batched_kinv_logdet(K, interpret: bool = False, chunk: int = 0,
                        alias: bool = False, base: int = 0):
    """(K^{-1}, logdet K) for a batch K (B, n, n) of PD matrices; f32.

    WARNING (round-3 regression, tests/test_fit_inverse.py): the Schur
    recursion is NON-FINITE on near-singular trajectory Grams (kappa
    ~1e6 f32) whenever it actually splits (base < n).  The FIT path
    therefore routes through `cholinv.batched_kinv_logdet_fit` (default:
    blocked-Cholesky kernel); use this kernel only on batches whose
    conditioning is known-moderate.

    chunk=0 picks the default batch chunk per grid cell (see CHUNK:
    larger chunks amortize the sweep loop's per-op overhead; the vmem
    budget is raised via CompilerParams so 32 compiles fine).  alias=True
    writes the inverse in place over the donated input buffer — safe
    because every region is read before it is overwritten (see
    inv_logdet's lazy reads) — but saves nothing under scoped-vmem
    accounting (in/out blocks are charged double-buffered even when
    aliased), so it stays opt-in.  base=0 picks the size-dependent
    default; resolved here OUTSIDE jit (trace-time global reads made
    same-shape A/Bs silently reuse the first trace)."""
    base = int(base) if base else _pick_base(K.shape[-1])
    return _batched_kinv_logdet_jit(K, interpret, chunk, alias, base)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "chunk", "alias", "base"))
def _batched_kinv_logdet_jit(K, interpret: bool, chunk: int,
                             alias: bool, base: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = K.shape
    N = _padded_size(n, base)
    if chunk == 0:
        chunk = _auto_chunk(N)
    Bp = max(_round_up(B, chunk), chunk)
    f32 = jnp.float32

    Kp = K.astype(f32)
    if Bp != B:
        # batch tail: identity matrices (finite garbage-free sweeps)
        eye = jnp.broadcast_to(jnp.eye(n, dtype=f32), (Bp - B, n, n))
        Kp = jnp.concatenate([Kp, eye], axis=0)

    grid = (Bp // chunk,)
    Kinv, ld = pl.pallas_call(
        functools.partial(_kernel, N, n, base),
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
            # scoped-VMEM headroom for chunk > 8 (v5e has 128M VMEM;
            # the default 16M budget rejects larger batch chunks)
            vmem_limit_bytes=VMEM_LIMIT),
        **({"input_output_aliases": {0: 0}} if alias else {}),
        interpret=interpret,
    )(Kp)
    return (Kinv[:B].astype(K.dtype),
            ld[:B, 0, 0].astype(K.dtype))
