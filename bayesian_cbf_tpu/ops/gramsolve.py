"""Fused fit-Gram + solve + logdet as one differentiable op.

The MLL refit consumes the masked training Gram ONLY through
(Km^{-1} Y, logdet Km) — see `models/mvgp.mll` and `cholinv.solve_and_
logdet`.  This op moves the differentiability boundary UP to the gram
inputs:

    forward:  build Km and invert it (the FIT_INVERSE Pallas kernel
              under vmap on TPU f32 — default the blocked-Cholesky
              kernel, see ops/cholinv.py; optionally Km is built
              inside the kernel's VMEM — see GRAM_IN_KERNEL);
    backward: dKm = -Kinv dS S^T + dlogdet * Kinv (the solve_and_logdet
              rule), chained through `jax.vjp` of the pure-XLA Gram
              expression — the gram internals are RECOMPUTED in the
              backward fusion instead of saved, so the forward writes
              no residual larger than Kinv (which the backward needs
              anyway).

Measured round 3 at the flagship (256, 200, 200): 4.10 (old unfused
pipeline) -> 3.82 ms per vmapped Adam iteration.  The win is the
remat-style VJP; building the Gram inside the kernel was a measured
LOSS (4.55 ms — see GRAM_IN_KERNEL).

Gram semantics are exactly `models/mvgp.mll`'s masked expression
(parity: bayes_cbf/control_affine_model.py:1045, the perturbed
train-Gram): Km = (s*rbf o UH B UH^T) * mask_outer + diag(nug*m + 1-m).
Distances use the cancellation-safe raw-difference-then-scale form
(round-2 dot-form-Gram regression; models/mvgp.k_xx docstring) and
ubu keeps XLA's left-to-right (UH (sB)) UH^T association.

Dispatch mirrors `cholinv.kinv_logdet`: the Pallas kernel only under
vmap on TPU f32 with k <= `cholinv._PALLAS_MAX_N`; the pure-XLA
reference expression everywhere else (CPU f64 parity tests, unbatched
fits).  `USE_FUSED` forces the choice for A/B tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import custom_batching

from .cholinv import _PALLAS_MAX_N, _kinv_logdet_ref

# None = auto (Pallas under vmap on TPU f32); True/False force
USE_FUSED = None
# NOTE a gram-built-INSIDE-the-kernel variant existed and measured 4.55
# vs 3.82 ms/Adam-iter for this remat-VJP + XLA-gram path at the
# flagship (256, 200, 200) — the in-kernel per-dimension sublane->lane
# transposes and serial VPU distance passes cost more than the
# (B, k, k) HBM round-trip they save, while XLA's gram overlaps the
# kernel DMA.  Removed (git history + records fused_fit_remat_vjp).


def km_expr(X, UB, UH, inv_ell, nug, mask):
    """Reference masked fit-Gram, unbatched.

    X (k, xd) raw states; UB = UH @ (outputscale * B) (k, mh);
    UH (k, mh); inv_ell (xd,); nug scalar; mask (k,) 0/1 validity.
    This is the expression the backward pass differentiates, and the
    correctness oracle for the fused kernel."""
    d = (X[:, None, :] - X[None, :, :]) * inv_ell
    d2 = jnp.sum(d * d, -1)
    rbf = jnp.exp(-0.5 * d2)
    ubu = UB @ UH.T
    outer = mask[:, None] * mask[None, :]
    eye = jnp.eye(X.shape[0], dtype=X.dtype)
    return (rbf * ubu * outer
            + nug * eye * mask[:, None]
            + eye * (1.0 - mask)[:, None])


@custom_batching.custom_vmap
def gram_kinv_logdet(X, UB, UH, inv_ell, nug, mask):
    """(Km^{-1}, logdet Km) of the masked fit-Gram, single GP."""
    return _kinv_logdet_ref(km_expr(X, UB, UH, inv_ell, nug, mask))


@gram_kinv_logdet.def_vmap
def _gram_kinv_logdet_vmap_rule(axis_size, in_batched, *args):
    # broadcast any unbatched operand so every arg carries the axis
    args = tuple(a if b else
                 jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                 for a, b in zip(args, in_batched))
    X, UB, UH, inv_ell, nug, mask = args
    use = USE_FUSED
    if use is None:
        use = (jax.default_backend() == "tpu"
               and X.dtype == jnp.float32
               and X.shape[-2] <= _PALLAS_MAX_N)   # k = the Gram dim
    # collapse any nested-vmap leading dims to one batch axis (the same
    # treatment as cholinv._kinv_logdet_vmap_rule)
    lead = X.shape[:-2]
    k, xd = X.shape[-2:]
    mh = UH.shape[-1]
    flat = lambda a: a.reshape((-1,) + a.shape[len(lead):])
    Xf, UBf, UHf = flat(X), flat(UB), flat(UH)
    ief, nugf, mf = flat(inv_ell), flat(nug), flat(mask)
    if use and X.ndim >= 3:
        from .cholinv import batched_kinv_logdet_fit
        Km = jax.vmap(km_expr)(Xf, UBf, UHf, ief, nugf, mf)
        Kinv, ld = batched_kinv_logdet_fit(Km.astype(jnp.float32))
    else:
        Kinv, ld = _kinv_logdet_ref(
            jax.vmap(km_expr)(Xf, UBf, UHf, ief, nugf, mf))
    out = (Kinv.reshape(lead + (k, k)).astype(X.dtype),
           ld.reshape(lead).astype(X.dtype))
    return out, (True, True)


def _gsl_impl(X, UB, UH, inv_ell, nug, mask, Y):
    if X.ndim == 2:
        Kinv, logdet = gram_kinv_logdet(X, UB, UH, inv_ell, nug, mask)
    else:
        # explicitly-batched call without vmap: plain XLA reference
        Kinv, logdet = _kinv_logdet_ref(
            jax.vmap(km_expr)(X, UB, UH, inv_ell, nug, mask))
    S = Kinv @ Y
    return S, logdet, Kinv


@jax.custom_vjp
def gram_solve_logdet(X, UB, UH, inv_ell, nug, mask, Y):
    """(Km^{-1} Y, logdet Km) with a matmul-only backward that never
    materializes gram residuals in the forward.  See module docstring."""
    S, logdet, _ = _gsl_impl(X, UB, UH, inv_ell, nug, mask, Y)
    return S, logdet


def _gsl_fwd(X, UB, UH, inv_ell, nug, mask, Y):
    S, logdet, Kinv = _gsl_impl(X, UB, UH, inv_ell, nug, mask, Y)
    return (S, logdet), (S, Kinv, X, UB, UH, inv_ell, nug, mask)


def _gsl_bwd(res, cts):
    S, Kinv, X, UB, UH, inv_ell, nug, mask = res
    dS, dlogdet = cts
    dY = jnp.zeros_like(S)
    dKm = jnp.zeros_like(Kinv)
    if dS is not None:
        dY = Kinv @ dS
        dKm = -dY @ jnp.swapaxes(S, -1, -2)
    if dlogdet is not None:
        dKm = dKm + dlogdet[..., None, None] * Kinv
    # chain through the gram expression; XLA recomputes rbf/ubu fused
    # into these contractions instead of saving them across fwd/bwd
    _, vjp = jax.vjp(km_expr, X, UB, UH, inv_ell, nug, mask)
    dX, dUB, dUH, dinv_ell, dnug, dmask = vjp(dKm)
    return dX, dUB, dUH, dinv_ell, dnug, dmask, dY


gram_solve_logdet.defvjp(_gsl_fwd, _gsl_bwd)
