from .socp import SOCPSolution, solve_socp, socp_residuals
from .qp import solve_qp_active_set

__all__ = ["SOCPSolution", "solve_socp", "socp_residuals",
           "solve_qp_active_set"]
