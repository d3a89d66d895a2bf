"""L2 projection of ∇u onto the P1 tensor space.

Replaces ``project(grad(w.sub(0)), V_vec)`` (``OCP_dolfin.py:328-329``,
``V_vec = TensorFunctionSpace(mesh, "Lagrange", 1)`` at ``:113``): four
mass-matrix solves with one shared factorization — the mass matrix is
constant, so it is factorized once at setup and reused in every gradient-
descent iteration (an optimization the reference's repeated `project`
cannot exploit).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..fem.spaces import TaylorHoodSpace
from ..fem import assemble
from ..ops import linalg


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GradProjector:
    mass: jnp.ndarray           # (n_p1, n_p1) float64
    fac: linalg.LUSolver

    def tree_flatten(self):
        return ((self.mass, self.fac), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def build(cls, space: TaylorHoodSpace,
              dense_apply: str = "lu") -> "GradProjector":
        mass = assemble.p1_mass_matrix(space)
        fac = (linalg.invert32(mass) if dense_apply == "inverse"
               else linalg.factorize(mass))
        return cls(mass, fac)

    def project(self, space: TaylorHoodSpace, u: jnp.ndarray,
                refine_iters: int = 8) -> jnp.ndarray:
        """u: (n_p2, 2) velocity dofs → (n_p1, 2, 2) nodal ∇u values."""
        rhs = assemble.gradu_projection_rhs(space, u)      # (n_p1, 2, 2)
        b = rhs.reshape(space.n_p1, 4).T                   # (4, n_p1)
        def solve_one(bc):
            return linalg.solve_refined(
                self.fac, lambda x: self.mass @ x, bc, refine_iters)
        sols = jax.vmap(solve_one)(b)                      # (4, n_p1)
        return sols.T.reshape(space.n_p1, 2, 2)
