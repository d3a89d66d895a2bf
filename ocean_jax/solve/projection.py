"""L2 projection of ∇u onto the P1 tensor space.

Replaces ``project(grad(w.sub(0)), V_vec)`` (``OCP_dolfin.py:328-329``,
``V_vec = TensorFunctionSpace(mesh, "Lagrange", 1)`` at ``:113``): four
mass-matrix solves with one shared factorization — the mass matrix is
constant, so it is factorized once at setup and reused in every gradient-
descent iteration (an optimization the reference's repeated `project`
cannot exploit).

Two regimes:

* **dense** (default below ``DENSE_P1_CAP`` P1 dofs): assemble the dense
  mass matrix once, LU-factorize (or build the explicit f32 inverse for
  ``dense_apply="inverse"``), solve with f32+refinement to f64 accuracy.
* **cg** (auto above the cap, where the dense matrix would be O(10 GB) —
  the Nx≥192 OOM): never materialize M. The P1 mass element matrix is
  ``detj · M_ref`` with a constant reference matrix, so the matvec is one
  (ncell,3)·(3,3) batched contraction + scatter — no stored operator at
  all. Solved by lumped-mass(Jacobi)-preconditioned CG in f64; the
  preconditioned P1 mass system has O(1) condition number independent of
  the mesh, so a fixed iteration count reaches machine precision
  (pinned by ``tests/test_projection.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..fem.spaces import TaylorHoodSpace
from ..fem import assemble
from ..ops import linalg

# Above this many P1 dofs the dense (n,n) f64 mass matrix stops being a
# sensible use of HBM (20k² f64 = 3.2 GB) and CG takes over. Nx=128 is
# the last dense resolution (16641 dofs); Nx≥192 (37249) OOMed the
# 16 GB v5e before this path existed.
DENSE_P1_CAP = 20_000

# Lumped-Jacobi-preconditioned CG on the P1 consistent mass converges
# ~0.4×/iter regardless of resolution; 60 iterations is ≥1e-15 with
# slack (measured ~1e-16 by iteration 40 at Nx=64).
CG_ITERS = 60


def _mass_matvec(space: TaylorHoodSpace, x: jnp.ndarray) -> jnp.ndarray:
    """y = M x for the P1 consistent mass, matrix-free. x: (n_p1,)."""
    m_ref = jnp.einsum("q,qa,qb->ab", space.qw, space.phi1, space.phi1)
    xl = x[space.cell_dofs_p1]                                # (ncell, 3)
    yl = space.cell_detj[:, None] * (xl @ m_ref)
    return jnp.zeros(space.n_p1, x.dtype).at[space.cell_dofs_p1].add(yl)


def _lumped_inverse(space: TaylorHoodSpace) -> jnp.ndarray:
    """1 / rowsum(M): the lumped-mass Jacobi preconditioner diagonal."""
    return 1.0 / _mass_matvec(space, jnp.ones(space.n_p1))


def _pcg(space: TaylorHoodSpace, minv: jnp.ndarray, b: jnp.ndarray,
         iters: int) -> jnp.ndarray:
    """Preconditioned CG for M x = b (single RHS; vmapped by caller).
    Fixed trip count (static under jit); divisions are guarded so extra
    iterations past convergence are no-ops, not NaNs."""
    x = minv * b
    r = b - _mass_matvec(space, x)
    z = minv * r
    p = z
    rz = r @ z

    def safe_div(a, d):
        return jnp.where(d != 0.0, a / jnp.where(d != 0.0, d, 1.0), 0.0)

    def body(_, st):
        x, r, p, rz = st
        ap = _mass_matvec(space, p)
        alpha = safe_div(rz, p @ ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = minv * r
        rz_new = r @ z
        beta = safe_div(rz_new, rz)
        p = z + beta * p
        return (x, r, p, rz_new)

    x, _, _, _ = lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GradProjector:
    mass: Optional[jnp.ndarray]        # dense (n_p1, n_p1) f64, or None (cg)
    fac: Optional[linalg.LUSolver]     # LU / explicit inverse, or None (cg)
    lumped_inv: Optional[jnp.ndarray]  # (n_p1,) Jacobi diag, or None (dense)
    mode: str = "lu"                   # "lu" | "inverse" | "cg" (static)

    def tree_flatten(self):
        return ((self.mass, self.fac, self.lumped_inv), self.mode)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, mode=aux)

    @classmethod
    def build(cls, space: TaylorHoodSpace,
              dense_apply: str = "lu",
              solver: str = "auto") -> "GradProjector":
        """solver: "auto" picks dense below DENSE_P1_CAP P1 dofs, cg
        above; "dense"/"cg" force a regime. dense_apply picks the dense
        application ("lu" triangular solves / "inverse" one MXU matmul)."""
        use_cg = (solver == "cg"
                  or (solver == "auto" and space.n_p1 > DENSE_P1_CAP))
        if use_cg:
            return cls(mass=None, fac=None,
                       lumped_inv=_lumped_inverse(space), mode="cg")
        mass = assemble.p1_mass_matrix(space)
        fac = (linalg.invert32(mass) if dense_apply == "inverse"
               else linalg.factorize(mass))
        return cls(mass, fac, None, mode=dense_apply)

    def project(self, space: TaylorHoodSpace, u: jnp.ndarray,
                refine_iters: int = 8) -> jnp.ndarray:
        """u: (n_p2, 2) velocity dofs → (n_p1, 2, 2) nodal ∇u values."""
        rhs = assemble.gradu_projection_rhs(space, u)      # (n_p1, 2, 2)
        b = rhs.reshape(space.n_p1, 4).T                   # (4, n_p1)
        if self.mode == "cg":
            sols = jax.vmap(
                lambda bc: _pcg(space, self.lumped_inv, bc, CG_ITERS))(b)
        else:
            def solve_one(bc):
                return linalg.solve_refined(
                    self.fac, lambda x: self.mass @ x, bc, refine_iters)
            sols = jax.vmap(solve_one)(b)                  # (4, n_p1)
        return sols.T.reshape(space.n_p1, 2, 2)
