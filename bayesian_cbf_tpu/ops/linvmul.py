"""Dispatch for the streaming posterior product vb = Linv @ kb.

Same dispatch pattern as ops/cholinv.py: a custom_vmap routes the
BATCHED case (the per-step moments of a batched rollout) to the VPU
streaming kernel (ops/pallas_linvmul.py) on TPU f32, while unbatched
callers (single-episode scans, CPU/f64 tests) stay on XLA; a custom VJP
keeps the op differentiable (pure matmuls) for the GP-expression-tree
paths that autodiff through posterior covariances.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import custom_batching

# OPT-IN (None resolves to off): measured round 3 on chip, the kernel
# beats XLA's bmm STANDALONE at the flagship shape (0.75 ms vs 0.85 ms,
# both exact f32 — and it exposed that the stock bmm ran at bf16-class
# 2.6e-3 relative error), but IN-PROGRAM inside the rollout scan it
# LOSES ~0.14 ms/step: the custom call breaks XLA's fusion of the
# surrounding moment/cone chain, and once the per-step small-Cholesky
# ladder was removed (utils.linalg.chol_small_unrolled) XLA keeps the
# loop-invariant Linv cache VMEM-resident across scan steps, which no
# HBM-streaming kernel can beat.  Kept for standalone batched posterior
# sweeps; force with USE_PALLAS = True.
USE_PALLAS = None

_MAX_K = 256


def _want_pallas(Linv):
    use = USE_PALLAS
    if use is None:
        use = False
    return use and Linv.dtype == jnp.float32 and Linv.shape[-1] <= _MAX_K


@custom_batching.custom_vmap
def _core(Linv, KB):
    """Single (k, k) @ (k, mh)."""
    return Linv @ KB


@_core.def_vmap
def _core_vmap_rule(axis_size, in_batched, Linv, KB):
    if not (in_batched[0] and in_batched[1]):
        # broadcastable mix: fall back to plain batched matmul semantics
        return jnp.matmul(Linv, KB), True
    if _want_pallas(Linv) and Linv.ndim >= 3:
        from .pallas_linvmul import batched_linv_matmul
        lead = Linv.shape[:-2]
        out = batched_linv_matmul(
            Linv.reshape((-1,) + Linv.shape[-2:]),
            KB.reshape((-1,) + KB.shape[-2:]))
        return out.reshape(lead + out.shape[-2:]), True
    return jnp.matmul(Linv, KB), True


@jax.custom_jvp
def linv_matmul(Linv, KB):
    """Linv @ KB with batched-case kernel dispatch; differentiable in
    BOTH modes (the pendulum CBC2 path jacfwd's through Bk_single, the
    GP-expression-tree paths reverse-differentiate) — custom_jvp, since
    the op is bilinear and JAX derives the transpose for reverse mode."""
    return _core(Linv, KB) if Linv.ndim == 2 else jnp.matmul(Linv, KB)


@linv_matmul.defjvp
def _linv_matmul_jvp(primals, tangents):
    Linv, KB = primals
    dLinv, dKB = tangents
    # tangents are off the hot path: plain (full-precision) matmuls
    return (linv_matmul(Linv, KB),
            jnp.matmul(dLinv, KB) + jnp.matmul(Linv, dKB))
