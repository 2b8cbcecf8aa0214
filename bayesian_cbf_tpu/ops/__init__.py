from .gram import fused_gram_kb, fused_gram_kb_reference

__all__ = ["fused_gram_kb", "fused_gram_kb_reference"]
