"""Linear saddle-point solves (Stokes and adjoint systems).

Replaces dolfin's ``solve(A, x, b)`` direct LU (``OCP_dolfin.py:371``,
``Stokes_gradient_check_dolfin.py:56,63``) with float32 LU + float64
matrix-free iterative refinement (see ``ocean_jax.ops.linalg``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..fem.assemble import Operator, apply_bc_vector
from ..ops import linalg


def solve_operator(op: Operator, b: jnp.ndarray, bc_vals: jnp.ndarray,
                   refine_iters: int = 12) -> jnp.ndarray:
    """Solve op x = b with Dirichlet values imposed on constrained dofs."""
    b = apply_bc_vector(b, op.bc_dofs, bc_vals)
    fac = linalg.factorize(op.dense())
    return linalg.solve_refined(fac, op.matvec64, b, refine_iters)


def solve_operator_reuse_t(op: Operator, b: jnp.ndarray,
                           bc_vals: jnp.ndarray, fac: linalg.LUSolver,
                           tol: float = 1e-12, max_iters: int = 30,
                           refine_iters: int = 12
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve op x = b WITHOUT a new factorization, preconditioned by the
    TRANSPOSED float32 LU factors of a nearby primal operator.

    The enabler of the one-factorization GD iteration: for ν=1 the
    reference's adjoint bilinear form (``OCP_dolfin.py:344-347`` — note its
    deliberately coefficient-free Laplacian) is exactly the transpose of
    the primal NS Newton Jacobian (``:321-322``), volume and Γ₁ facet
    terms alike. So the Newton solve's factors, applied with ``trans=1``,
    precondition the adjoint solve; BC-projected Richardson refinement
    against the exact float64 adjoint matvec absorbs the float32 error,
    the Newton state lag (factors are J(w_{k-1}), the operator is at w*),
    and the stale-Stokes-factor case of the ``newton_reuse_lu`` fast path.

    Dirichlet handling: J has identity ROWS at constrained dofs, so Jᵀ has
    identity columns — applying ``solve32_t`` to a residual that vanishes
    on constrained rows updates interior dofs by A_IIᵀ⁻¹ r_I exactly;
    re-projecting x onto the BC values each sweep keeps the boundary
    exact and the residual's constrained rows zero.

    Returns (x, converged). If the Richardson loop has not contracted to
    ``tol·‖b‖`` (e.g. strongly convective states under Stokes-frozen
    factors), a ``lax.cond`` falls back to a fresh factorization — the
    untaken branch costs nothing at runtime, so accuracy is unconditional.
    """
    b = apply_bc_vector(b, op.bc_dofs, bc_vals)
    bnorm = jnp.linalg.norm(b)
    target = tol * jnp.maximum(bnorm, 1e-300)

    def project(x):
        return x.at[op.bc_dofs].set(b[op.bc_dofs])

    x0 = project(fac.solve32_t(b))
    r0 = b - op.matvec64(x0)          # vanishes on BC rows by construction

    def cond_fn(state):
        x, r, rnorm, it = state
        return (rnorm > target) & (it < max_iters) & jnp.isfinite(rnorm)

    def body(state):
        x, r, rnorm, it = state
        x = project(x + fac.solve32_t(r))
        r = b - op.matvec64(x)
        return (x, r, jnp.linalg.norm(r), it + 1)

    x, r, rnorm, it = jax.lax.while_loop(
        cond_fn, body, (x0, r0, jnp.linalg.norm(r0), jnp.asarray(0)))
    converged = rnorm <= target

    def fresh():
        f2 = linalg.factorize(op.dense())
        return linalg.solve_refined(f2, op.matvec64, b, refine_iters)

    x = jax.lax.cond(converged, lambda: x, fresh)
    return x, converged
