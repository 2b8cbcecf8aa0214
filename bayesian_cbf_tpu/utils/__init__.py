"""L0 substrate exports.

Importing this package pins JAX's default matmul precision to full f32
accumulation ("highest").  On TPU the stock default lowers f32 matmuls
to bf16 MXU passes; measured on chip (round 3), that put 0.2-0.6%
relative error into the Gram's u^T B u factor, the posterior-mean
einsum, and the moments covariance product — and it was the entire
cause of the f32 IPM plateau fixed in solvers/socp.py.  This framework
is a safety-critical control stack: chance-constraint margins must not
silently carry bf16 noise.  Hot paths that tolerate-or-beat this
setting route through explicit Pallas kernels (ops/), which are exact
f32 by construction.  Escape hatch: set BAYESIAN_CBF_TPU_FAST_MATMUL=1
before import to keep the platform default.
"""
import os as _os

import jax as _jax

if not _os.environ.get("BAYESIAN_CBF_TPU_FAST_MATMUL"):
    _jax.config.update("jax_default_matmul_precision", "highest")

from .linalg import kron, psd_cholesky, psd_clamp_eigh, masked_cholesky
from .func import (affine_terms, quadratic_terms, normalize_radians,
                   clip_vec, epsilon_interp)
from .debug import checkify_nan, gradcheck, gradgradcheck

__all__ = [
    "kron", "psd_cholesky", "psd_clamp_eigh", "masked_cholesky",
    "affine_terms", "quadratic_terms", "normalize_radians",
    "clip_vec", "epsilon_interp",
    "checkify_nan", "gradcheck", "gradgradcheck",
]
