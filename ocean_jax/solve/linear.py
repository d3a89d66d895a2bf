"""Linear saddle-point solves (Stokes and adjoint systems).

Replaces dolfin's ``solve(A, x, b)`` direct LU (``OCP_dolfin.py:371``,
``Stokes_gradient_check_dolfin.py:56,63``) with float32 LU + float64
matrix-free iterative refinement (see ``ocean_jax.ops.linalg``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.assemble import Operator, apply_bc_vector
from ..ops import linalg


def solve_operator(op: Operator, b: jnp.ndarray, bc_vals: jnp.ndarray,
                   refine_iters: int = 12) -> jnp.ndarray:
    """Solve op x = b with Dirichlet values imposed on constrained dofs."""
    b = apply_bc_vector(b, op.bc_dofs, bc_vals)
    fac = linalg.factorize(op.dense())
    return linalg.solve_refined(fac, op.matvec64, b, refine_iters)
