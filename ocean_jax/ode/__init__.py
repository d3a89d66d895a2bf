from .primal import solve_primal_ode, PrimalODEResult
from .adjoint import (solve_adjoint_ode, solve_adjoint_ode_implicit,
                      solve_adjoint_ode_consistent)

__all__ = ["solve_primal_ode", "PrimalODEResult",
           "solve_adjoint_ode", "solve_adjoint_ode_implicit",
           "solve_adjoint_ode_consistent"]
