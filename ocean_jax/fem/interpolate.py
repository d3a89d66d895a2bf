"""Point evaluation of FE fields (vmapped) and boundary-quad restriction.

Replaces dolfin's ``Function.__call__(point)`` — the reference's hot loop #1
(``OCP_dolfin.py:207-212``, one Python→C++ crossing per buoy per time step)
— with fully batched O(1) structured point location + basis contraction,
usable inside ``jit``/``vmap``/``scan``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..mesh.locate import locate_points
from .spaces import TaylorHoodSpace, BoundaryQuad


def _p2_basis_jnp(xi: jnp.ndarray) -> jnp.ndarray:
    x, y = xi[..., 0], xi[..., 1]
    l0 = 1.0 - x - y
    return jnp.stack([
        l0 * (2 * l0 - 1), x * (2 * x - 1), y * (2 * y - 1),
        4 * x * y, 4 * l0 * y, 4 * l0 * x,
    ], axis=-1)


def _p1_basis_jnp(xi: jnp.ndarray) -> jnp.ndarray:
    x, y = xi[..., 0], xi[..., 1]
    return jnp.stack([1.0 - x - y, x, y], axis=-1)


def eval_velocity(space: TaylorHoodSpace, u: jnp.ndarray,
                  points: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate a P2 velocity field at arbitrary points.

    u: (n_p2, 2); points: (..., 2). Returns (values (..., 2), inside (...,)).
    Out-of-domain lanes get clamped-evaluation values — mask with `inside`
    (the branchless analog of the reference's try/except,
    ``OCP_dolfin.py:209-221``).
    """
    cell, xi, inside = locate_points(space.locator, points)
    phi = _p2_basis_jnp(xi)                              # (..., 6)
    dofs = space.cell_dofs_p2[cell]                      # (..., 6)
    vals = jnp.einsum("...a,...ai->...i", phi, u[dofs])
    return vals, inside


def eval_p1_tensor(space: TaylorHoodSpace, g: jnp.ndarray,
                   points: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate a P1 tensor field (the projected ∇u) at points.

    g: (n_p1, 2, 2); points: (..., 2) → (values (..., 2, 2), inside).
    Matches dolfin's component ordering at ``OCP_dolfin.py:243-245``:
    value[i, j] = ∂u_i/∂x_j.
    """
    cell, xi, inside = locate_points(space.locator, points)
    phi = _p1_basis_jnp(xi)                              # (..., 3)
    dofs = space.cell_dofs_p1[cell]
    vals = jnp.einsum("...a,...aij->...ij", phi, g[dofs])
    return vals, inside


def eval_velocity_basis(space: TaylorHoodSpace, points: jnp.ndarray):
    """Point-location + P2 basis values (for point sources: the transpose of
    interpolation — SURVEY §7.3 'PointSource transpose').

    Returns (cell, dofs (...,6), phi (...,6), inside)."""
    cell, xi, inside = locate_points(space.locator, points)
    phi = _p2_basis_jnp(xi)
    dofs = space.cell_dofs_p2[cell]
    return cell, dofs, phi, inside


def boundary_eval_velocity(space: TaylorHoodSpace, bq: BoundaryQuad,
                           u: jnp.ndarray) -> jnp.ndarray:
    """Restrict a P2 velocity field to the Γ₁ quadrature points:
    (nf, nq, 2). Exact (uses the facet trace basis tables)."""
    dofs = space.cell_dofs_p2[bq.cells]                  # (nf, 6)
    return jnp.einsum("fqa,fai->fqi", bq.phi2, u[dofs])


def interpolate_p2(space: TaylorHoodSpace, fn) -> jnp.ndarray:
    """Interpolate an analytic vector expression into P2 dof values:
    fn maps (n, 2) coords → (n, 2) values (evaluated at dof coordinates)."""
    coords = np.asarray(space.dof_coords_p2)
    return jnp.asarray(np.asarray(fn(coords)))
