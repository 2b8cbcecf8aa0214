from .mvgp import (MVGPParams, MVGPData, MVGPCache, MVGP,
                   make_mvgp, make_mvgp_rank1, make_mvgp_diag)
from .cogp import CoGP, make_cogp, make_cogp_diag

__all__ = [
    "MVGPParams", "MVGPData", "MVGPCache", "MVGP",
    "make_mvgp", "make_mvgp_rank1", "make_mvgp_diag",
    "CoGP", "make_cogp", "make_cogp_diag",
]
