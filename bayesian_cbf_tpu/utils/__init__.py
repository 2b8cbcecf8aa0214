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
