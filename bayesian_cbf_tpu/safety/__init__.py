from .cbc import (cbc2_gp, cbc2_quadratic_terms, cbc1_safety_factor,
                  cbc2_safety_factor, cbc_to_socp_cone)

__all__ = ["cbc2_gp", "cbc2_quadratic_terms", "cbc1_safety_factor",
           "cbc2_safety_factor", "cbc_to_socp_cone"]
