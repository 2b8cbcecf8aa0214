"""Cholesky-with-explicit-inverse as one differentiable op.

Motivation (measured on chip, rollout-scale slopes — see PARITY.md): the
MLL refit is the flagship loop's dominant term at ~24 ms per vmapped Adam
iteration (batch=256, k=200), and TPU triangular solves are the slow
part: XLA's autodiff of `cholesky` runs two triangular solves per
backward pass, each a latency-bound blocked loop.

`chol_with_inv(K) -> (L, Linv)` computes the factor AND its explicit
inverse in the forward pass (one solve-against-identity), then defines a
custom VJP that is PURE MATMULS:

    vjp wrt Linv:  dL += -Linv^T dLinv Linv^T        (inverse rule)
    vjp wrt L:     dK  = Linv^T Phi(L^T dL) Linv     (Murray 2016),
                   Phi = tril with halved diagonal, symmetrized output

so the whole fit backward touches no triangular solve.  Downstream code
(posterior solves, quad forms) uses Linv matmuls on the MXU, which the
inference cache already does (MVGPCache.Linv).

When the surrounding computation is vmapped (the batched Monte-Carlo
refit), a custom-vmap rule dispatches the forward to the Pallas blocked
factorization kernel (ops/pallas_chol.py) on TPU f32 — XLA's batched
cholesky/triangular_solve are the latency-bound ops it replaces.  Set
`cholinv.USE_PALLAS = False` to force the XLA path (tests compare both).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import custom_batching

# None = auto (Pallas on TPU f32 under vmap); True/False force
USE_PALLAS = None

# FIT-path kernels: n <= 1024 (auto-chunk shrinks the batch chunk so
# the VMEM blocks fit the raised scoped budget; at n=1024 it lands at
# 2).  Validated on chip round 4 (records k1024_kernel_probe: cholk
# resid 0.031 at kappa 2.7e6, ld err 0.014, 37.6 ms at B=8).
_PALLAS_MAX_N = 1024
# REFRESH-path factor kernel (chol_with_inv -> posterior cache): the
# XLA-SIDE row-form Linv assembly loses accuracy at large n x high
# kappa (measured n=1024: resid ~38-50 for nb 16/32 vs 0.028 for XLA
# chol+trsm and 0.031 for IN-kernel assembly; records
# k1024_refresh_assembly_ab) — with the round-4 assembly="kernel"
# default the refresh path shares the fit path's accuracy and cap.
_PALLAS_MAX_N_FACTOR = 1024

# Which kernel the batched FIT inversion (kinv_logdet / gramsolve) uses:
#   "cholk" (default): ONE Pallas call — blocked-Cholesky factor +
#           row-form Linv assembly + Linv^T Linv + logdet, all on VMEM
#           values.  Same trailing-update arithmetic as "chol" (so the
#           same Cholesky-class stability on the kappa~1e6 trajectory
#           Grams, resid ~8e-3) without the per-Adam-iteration L/Dinv
#           HBM round-trips and XLA assembly dispatches: 9.8 -> 5.3
#           ms/Adam-iter at (256, 200) on chip (round 4).
#   "chol": blocked-Cholesky kernel + XLA-side assembly.  The real
#           flagship fit Grams are trajectory-correlated and sit at
#           kappa ~ 1e6 in f32 (relative-nugget floor vs a ~200x diag
#           spread); Cholesky's trailing updates work on original data
#           and stay backward-stable there (measured resid ~9e-3).
#   "sweep": the recursive Schur/sweep kernel (ops/pallas_sweep.py).
#           ~2x faster per inversion, but its Schur recursion squares
#           the explicit-inverse error of near-singular leading blocks:
#           on the SAME real Grams every recursive split produces
#           non-finite output (negative pivot -> 1/tiny overflow), the
#           fit's NaN guard then rejects every Adam step, and batched
#           learning silently dies — the round-3 Monte-Carlo
#           mean-goal-distance 0.53 -> 2.81 regression
#           (records/tpu_round3.jsonl, flagship_monte_carlo_1024).
#           Tests pin the failure: tests/test_fit_inverse.py.
FIT_INVERSE = "cholk"


def _ref_fwd(K):
    L = jnp.linalg.cholesky(K)
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    Linv = jax.scipy.linalg.solve_triangular(
        L, jnp.broadcast_to(eye, K.shape), lower=True)
    return L, Linv


@custom_batching.custom_vmap
def _chol_inv_core(K):
    """(L, Linv) for a single (n, n) PSD matrix."""
    return _ref_fwd(K)


def _want_pallas(K, max_n=None):
    use = USE_PALLAS
    if use is None:
        use = (jax.default_backend() == "tpu"
               and K.dtype == jnp.float32
               and K.shape[-1] <= (max_n or _PALLAS_MAX_N))
    return use


@_chol_inv_core.def_vmap
def _chol_inv_vmap_rule(axis_size, in_batched, K):
    if not in_batched[0]:
        # unbatched operand under vmap: compute once, mark unbatched
        return _ref_fwd(K), (False, False)
    if _want_pallas(K, _PALLAS_MAX_N_FACTOR) and K.ndim >= 3:
        from .pallas_chol import batched_chol_with_inv
        # the kernel wants exactly one batch dim; collapse nested vmap
        # levels (K can be >3-D when this op sits under stacked vmaps)
        lead = K.shape[:-2]
        L, Linv = batched_chol_with_inv(K.reshape((-1,) + K.shape[-2:]))
        out = (L.reshape(lead + L.shape[-2:]),
               Linv.reshape(lead + Linv.shape[-2:]))
    else:
        out = _ref_fwd(K)
    return out, (True, True)


@jax.custom_vjp
def chol_with_inv(K):
    """(L, Linv) for PSD K (..., n, n); differentiable, matmul-only VJP."""
    return _chol_inv_core(K) if K.ndim == 2 else _ref_fwd(K)


def _fwd(K):
    L, Linv = chol_with_inv(K)
    return (L, Linv), (L, Linv)


def _phi(M):
    """tril with halved diagonal (the Cholesky-VJP weighting)."""
    return jnp.tril(M) - 0.5 * jnp.tril(jnp.triu(M))


def _bwd(res, cts):
    L, Linv = res
    dL, dLinv = cts
    dL = jnp.zeros_like(L) if dL is None else dL
    if dLinv is not None:
        # d inv(L) = -Linv dL Linv  =>  cotangent into L
        dL = dL - jnp.swapaxes(Linv, -1, -2) @ dLinv \
            @ jnp.swapaxes(Linv, -1, -2)
    M = _phi(jnp.swapaxes(L, -1, -2) @ dL)
    dK = jnp.swapaxes(Linv, -1, -2) @ M @ Linv
    dK = 0.5 * (dK + jnp.swapaxes(dK, -1, -2))
    return (dK,)


chol_with_inv.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# fused solve + logdet for the MLL (one k^3 matmul TOTAL per fwd+bwd)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def solve_and_logdet(K, Y):
    """(K^{-1} Y, logdet K) for PD K (..., k, k), Y (..., k, n).

    The marginal-log-likelihood only consumes the Gram through these two
    quantities, so giving the pair ONE custom VJP collapses the fit's
    backward to small matmuls: the forward computes the explicit inverse
    with the FIT_INVERSE kernel (default: blocked-Cholesky kernel +
    Linv^T Linv — robust on the near-singular real fit Grams; see the
    flag's docstring) and the backward reuses it:

        S = K^{-1} Y
        dK = -Kinv dS S^T + dlogdet * Kinv      (all O(k^2 n))
        dY =  Kinv dS

    versus the generic chain (inverse-rule + Murray Phi-path) which
    costs ~4 k^3 matmuls per MLL gradient.  Diagonal logs are floored
    at 1e-20 to keep the f32 fast path NaN-free on marginal factors."""
    S, logdet, _ = _sld_impl(K, Y)
    return S, logdet


def _kinv_logdet_ref(K):
    L, Linv = _ref_fwd(K)
    Kinv = jnp.swapaxes(Linv, -1, -2) @ Linv
    tiny = jnp.asarray(1e-20, L.dtype)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.maximum(diag, tiny)), axis=-1)
    return Kinv, logdet


# factorization block / batch chunk for the fit-path Cholesky kernels
# (0 = the per-kind defaults below); exposed for on-chip tuning —
# smaller blocks cut the serial factor loop's sublane footprint, larger
# chunks amortize its per-op overhead (the sweep-kernel lessons)
FIT_CHOL_NB = 0
FIT_CHOL_CHUNK = 0
# cholk defaults, on-chip A/B round 4 (ms/Adam-iter at (256, 200)):
# nb 32/16 at chunk 32 = 6.13/5.29; chunk 16 vs 32 at nb 32 = 7.86/6.13
CHOLK_NB = 16
CHOLK_CHUNK = 32
FIT_CHOL_ASSEMBLY = ""   # "" = kernel default (row); "col" = legacy A/B


def batched_kinv_logdet_fit(K3, interpret: bool = False):
    """(K^{-1}, logdet) for a (B, n, n) batch on the FIT path, routed
    per FIT_INVERSE (see the flag's docstring for the robustness
    story).  f32 Pallas kernels on TPU; interpret=True for CPU tests.
    FIT_INVERSE="xla" bypasses Pallas entirely (batched XLA
    cholesky+triangular_solve — the known-good latency-bound fallback,
    resid 5.7e-3 on the real flagship Gram)."""
    if FIT_INVERSE == "xla":
        return _kinv_logdet_ref(K3)
    if FIT_INVERSE == "cholk":
        # single-call kernel: factor + Linv assembly + Linv^T Linv all in
        # VMEM — same arithmetic as "chol" (identical trailing updates,
        # Cholesky-class stability on the trajectory Grams) minus the
        # per-iteration L/Dinv HBM round-trips and XLA assembly
        from .pallas_chol import batched_kinv_logdet_chol
        return batched_kinv_logdet_chol(K3, interpret=interpret,
                                        nb=FIT_CHOL_NB or CHOLK_NB,
                                        chunk=FIT_CHOL_CHUNK or CHOLK_CHUNK)
    if FIT_INVERSE == "chol":
        from .pallas_chol import batched_chol_with_inv
        L, Linv = batched_chol_with_inv(K3, interpret=interpret,
                                        nb=FIT_CHOL_NB,
                                        chunk=FIT_CHOL_CHUNK,
                                        assembly=FIT_CHOL_ASSEMBLY)
        Kinv = jnp.swapaxes(Linv, -1, -2) @ Linv
        tiny = jnp.asarray(1e-20, L.dtype)
        diag = jnp.diagonal(L, axis1=-2, axis2=-1)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.maximum(diag, tiny)), axis=-1)
        return Kinv, logdet
    from .pallas_sweep import batched_kinv_logdet
    if FIT_INVERSE == "sweep_full":
        # NON-recursive full-width sweep: one sweep block, no Schur
        # split.  Unlike the recursive path it stays finite on the real
        # trajectory-correlated fit Grams (resid ~1.1e-2, records
        # sweep_full_probe) because no near-singular leading block gets
        # explicitly inverted; kept as an opt-in until its wall beats
        # the chol kernel in-program.
        n = K3.shape[-1]
        full = max(256, -(-n // 256) * 256)
        return batched_kinv_logdet(K3, interpret=interpret, base=full)
    return batched_kinv_logdet(K3, interpret=interpret)


@custom_batching.custom_vmap
def kinv_logdet(K):
    """(K^{-1}, logdet K) for one PD (n, n) matrix.

    Measured round 2: routing the UNBATCHED case through the sweep
    kernel as a size-1 batch is 23x slower than XLA's chol+trsm inside
    a fit scan (35 ms vs 1.5 ms per Adam iteration; standalone the
    kernel is 3.4 ms at B=1 — a single grid cell's serial sweep doesn't
    amortize, and in-scan it pipelines even worse).  Kernels only pay
    off batched; the single-matrix case stays on XLA."""
    return _kinv_logdet_ref(K)


@kinv_logdet.def_vmap
def _kinv_logdet_vmap_rule(axis_size, in_batched, K):
    """Batched dispatch: the recursive Schur/sweep Pallas kernel on TPU
    f32 (ops/pallas_sweep.py) — no triangular op anywhere; XLA
    Cholesky-based reference elsewhere."""
    if not in_batched[0]:
        return _kinv_logdet_ref(K), (False, False)
    if _want_pallas(K) and K.ndim >= 3:
        # collapse any nested-vmap leading dims to the kernel's single
        # batch axis, then restore them
        lead = K.shape[:-2]
        Kinv, logdet = batched_kinv_logdet_fit(
            K.reshape((-1,) + K.shape[-2:]))
        out = (Kinv.reshape(lead + Kinv.shape[-2:]),
               logdet.reshape(lead))
    else:
        out = _kinv_logdet_ref(K)
    return out, (True, True)


def _sld_impl(K, Y):
    Kinv, logdet = (kinv_logdet(K) if K.ndim == 2
                    else _kinv_logdet_ref(K))
    S = Kinv @ Y
    return S, logdet, Kinv


def _sld_fwd(K, Y):
    S, logdet, Kinv = _sld_impl(K, Y)
    return (S, logdet), (S, Kinv)


def _sld_bwd(res, cts):
    S, Kinv = res
    dS, dlogdet = cts
    dY = jnp.zeros_like(S)
    dK = jnp.zeros_like(Kinv)
    if dS is not None:
        dY = Kinv @ dS
        dK = -dY @ jnp.swapaxes(S, -1, -2)
    if dlogdet is not None:
        dK = dK + dlogdet[..., None, None] * Kinv
    return dK, dY


solve_and_logdet.defvjp(_sld_fwd, _sld_bwd)
