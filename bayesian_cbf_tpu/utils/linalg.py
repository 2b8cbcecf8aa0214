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
