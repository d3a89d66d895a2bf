from .primal import solve_primal_ode, PrimalODEResult
from .adjoint import solve_adjoint_ode, solve_adjoint_ode_implicit

__all__ = ["solve_primal_ode", "PrimalODEResult",
           "solve_adjoint_ode", "solve_adjoint_ode_implicit"]
