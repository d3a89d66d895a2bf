"""Gen-1 compatibility layer.

The reference keeps an older, class-structured dolfinx implementation
(``old_dolfinx_files/``, SURVEY C6-C11) whose API shape — explicit solver
classes with ``solve_stokes_step`` / ``state_solving_step`` /
``ode_solving_step`` / ``adjoint_ode_solving_step`` /
``adjoint_state_solving_step`` — is the structured interface this module
provides on top of the TPU-native kernels, including the gen-1 weak-form
variants (tanh-regularized backflow stabilization, opposite pressure sign,
viscous adjoint) and the gen-1 FD-verification helpers.
"""

from .solvers import NavierStokesSolver, ODESolver
from . import helpers

__all__ = ["NavierStokesSolver", "ODESolver", "helpers"]
