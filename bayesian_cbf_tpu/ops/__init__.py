from .gram import fused_gram_kb, fused_gram_kb_reference
from .gramsolve import gram_solve_logdet, gram_kinv_logdet

__all__ = ["fused_gram_kb", "fused_gram_kb_reference",
           "gram_solve_logdet", "gram_kinv_logdet"]
