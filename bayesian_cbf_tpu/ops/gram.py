"""Pallas TPU kernel: fused masked MVGP Gram construction.

The training-Gram of the MVGP (SURVEY.md 3.3, control_affine_model.py:1045)
is

    Kb = [ s * exp(-1/2 ||(x_i - x_j)/l||^2) ] o [ uh_i^T B uh_j ]
         masked to valid rows/cols, identity on invalid diagonal, + jitter I

i.e. two small matmuls (the squared-distance cross term and the task
bilinear form) plus elementwise exp/multiply/mask.  XLA emits these as
separate HLOs with intermediate (K, K) buffers; this kernel fuses the whole
thing into one VMEM-resident pass: both matmuls hit the MXU back-to-back and
the elementwise epilogue never leaves registers.

Layout requirements (guide: tile (8,128) fp32): K padded to a multiple of 8,
feature/task dims padded to 128 lanes.  For the sizes this model runs
(K <= 512, n <= 16, 1+m <= 16) everything fits in VMEM in one block.

Falls back to the pure-XLA expression on non-TPU platforms (also used as
the correctness oracle in tests via interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANES = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def fused_gram_kb_reference(Xs, UHB_half, mask, outputscale, jitter):
    """Pure-XLA oracle.  Xs = X / lengthscale (K, n);
    UHB_half = UH @ chol(B) (K, 1+m); mask (K,).

    Distances use the exact per-dimension difference form: the
    dot-product form |a|^2+|b|^2-2ab cancels catastrophically for
    nearby points (consecutive ring-buffer states), see
    models/mvgp.py k_xx and the round-2 regression bisect."""
    d = Xs[:, None, :] - Xs[None, :, :]
    d2 = jnp.sum(d * d, -1)
    rbf = outputscale * jnp.exp(-0.5 * d2)
    ubu = UHB_half @ UHB_half.T
    K = rbf * ubu
    outer = mask[:, None] * mask[None, :]
    eye = jnp.eye(K.shape[0], dtype=K.dtype)
    return K * outer + eye * (1.0 - mask)[:, None] + jitter * eye * mask[:, None]


def _gram_kernel(n, xs_ref, uhb_ref, mask_ref, scal_ref, out_ref):
    """Single-block fused Gram kernel (everything VMEM-resident).

    Distances accumulate EXACT per-dimension differences (n static,
    <= 16): the MXU dot-form |a|^2+|b|^2-2ab cancels catastrophically
    in f32 for nearby points — ring-buffer data are consecutive states
    dt apart (round-2 regression; see models/mvgp.py k_xx)."""
    Xs = xs_ref[:]                       # (Kp, 128)
    UHB = uhb_ref[:]                     # (Kp, 128)
    m = mask_ref[:]                      # (Kp, 128) broadcast mask column 0
    outputscale = scal_ref[0, 0]
    jitter = scal_ref[0, 1]

    Kp_ = Xs.shape[0]
    d2 = jnp.zeros((Kp_, Kp_), Xs.dtype)
    for a in range(n):
        col = Xs[:, a:a + 1]                             # (Kp, 1)
        diff = col - col.T                               # (Kp, Kp) exact
        d2 = d2 + diff * diff
    rbf = outputscale * jnp.exp(-0.5 * d2)
    ubu = jnp.dot(UHB, UHB.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)

    mk = m[:, 0:1]                                       # (Kp, 1) validity
    outer = mk * mk.T
    Kp = Xs.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (Kp, Kp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Kp, Kp), 1)
    eye = (row == col).astype(rbf.dtype)
    out_ref[:] = (rbf * ubu * outer
                  + eye * (1.0 - mk)
                  + jitter * eye * mk)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_gram_kb(Xs, UHB_half, mask, outputscale, jitter,
                  interpret: bool = False):
    """Fused masked Gram via Pallas.  Same contract as the reference fn."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, n = Xs.shape
    mh = UHB_half.shape[1]
    Kp = max(_round_up(K, 8), 8)
    f32 = jnp.float32

    xs_p = jnp.zeros((Kp, _LANES), f32).at[:K, :n].set(Xs.astype(f32))
    uhb_p = jnp.zeros((Kp, _LANES), f32).at[:K, :mh].set(
        UHB_half.astype(f32))
    mask_p = jnp.zeros((Kp, _LANES), f32).at[:K, 0].set(
        mask.astype(f32))
    scal = jnp.asarray([[outputscale, jitter]], f32)

    out = pl.pallas_call(
        functools.partial(_gram_kernel, n),
        out_shape=jax.ShapeDtypeStruct((Kp, Kp), f32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xs_p, uhb_p, mask_p, scal)
    return out[:K, :K].astype(Xs.dtype)
