"""Pallas TPU kernel: streaming batched L^{-1} @ kb for the per-step
posterior moments — VPU lane-reductions, no MXU.

Why: the flagship moments phase evaluates vb = Linv @ kb once per
control step at (B=256, k=200, mh=3).  The op is pure HBM streaming of
the (B, k, k) Linv cache (41 MB -> 0.376 ms floor at this part's
measured 109 GB/s), but XLA's batched matmul runs it at ~0.75-0.93 ms:
the MXU path pads the mh=3 operand to 128 lanes (43x FLOP waste,
measured round 2 — that attempt fed the MXU and was abandoned).  The
FLOPs are trivial (k^2 mh = 120k MACs/elem), so this kernel instead
does mh lane-reductions on the VPU per batch chunk:

    vb[:, :, j] = sum_lanes(Linv_block * KBT[:, j:j+1, :])

with the kb operand pre-transposed OUTSIDE the kernel (tiny tensor) so
each column broadcast is a natural (CB, 1, k) tile — no in-kernel
transposes.  HBM traffic: one Linv read + the (B, k, mh) write; VMEM
re-reads are free by comparison.  Cite: the reference's per-step
posterior evaluation custom_predict_fullmat
(bayes_cbf/control_affine_model.py:553-608) — this is its hot inner
product on our side.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

CHUNK = 8
_MAX_K = 256     # (CHUNK, 512, 512) blocks exceed the 16M scoped budget


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(mh, linv_ref, kbt_ref, out_ref):
    for j in range(mh):
        row = kbt_ref[:, j:j + 1, :]                    # (CB, 1, k)
        out_ref[:, :, j:j + 1] = jnp.sum(
            linv_ref[:] * row, axis=2, keepdims=True)   # lane reduction


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def batched_linv_matmul(Linv, KB, interpret: bool = False,
                        chunk: int = CHUNK):
    """VB[b] = Linv[b] @ KB[b] for Linv (B, k, k), KB (B, k, mh); f32.

    k is zero-padded to a multiple of 128 (zeros contribute nothing to
    the lane reductions); batch pads to the chunk grid."""
    B, k, _ = Linv.shape
    mh = KB.shape[-1]
    f32 = jnp.float32
    Kp = _round_up(k, 128)
    Bp = max(_round_up(B, chunk), chunk)

    Lp = jnp.zeros((Bp, k, Kp), f32).at[:B, :, :k].set(Linv.astype(f32))
    # pre-transpose kb outside the kernel: (B, k, mh) -> (Bp, mh, Kp)
    KT = jnp.zeros((Bp, mh, Kp), f32).at[:B, :, :k].set(
        jnp.swapaxes(KB.astype(f32), 1, 2))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (Bp // chunk,)
    out = pl.pallas_call(
        functools.partial(_kernel, mh),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((Bp, k, mh), f32),
        in_specs=[pl.BlockSpec((chunk, k, Kp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((chunk, mh, Kp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, k, mh), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Lp, KT)
    return out[:B].astype(Linv.dtype)
