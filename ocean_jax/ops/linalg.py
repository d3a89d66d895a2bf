"""Mixed-precision dense linear algebra for the saddle-point solves.

The reference delegates every linear solve to PETSc's sparse LU
(``OCP_dolfin.py:325,371``). On TPU the MXU has no native float64, so the
TPU-native design is:

  * factorize the operator once in float32 (fast, MXU/blocked LU),
  * recover float64 accuracy by iterative refinement, computing residuals
    with an *exact* float64 matrix-free apply (element-level einsum — see
    ``ocean_jax.fem.assemble.Operator.matvec64``) and correcting through the
    float32 factors.

With cond(A)·eps32 ≪ 1 each sweep contracts the error by ~cond(A)·eps32;
a handful of sweeps reaches ~1e-12 relative residuals, matching the direct
fp64 LU the reference relies on.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LUSolver:
    """float32 LU factors of a dense operator."""

    lu: jnp.ndarray
    piv: jnp.ndarray

    def tree_flatten(self):
        return ((self.lu, self.piv), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def solve32(self, b: jnp.ndarray) -> jnp.ndarray:
        return jsl.lu_solve((self.lu, self.piv),
                            b.astype(jnp.float32)).astype(jnp.float64)


def factorize(a: jnp.ndarray) -> LUSolver:
    """LU-factorize a dense matrix in float32."""
    lu, piv = jsl.lu_factor(a.astype(jnp.float32))
    return LUSolver(lu, piv)


def solve_refined(fac: LUSolver, matvec64: Callable[[jnp.ndarray], jnp.ndarray],
                  b: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Solve A x = b to float64 accuracy via iterative refinement.

    ``matvec64`` must be the exact float64 action of the SAME operator the
    float32 factors approximate (including identity rows on Dirichlet dofs).
    """
    x = fac.solve32(b)

    def body(_, x):
        r = b - matvec64(x)
        return x + fac.solve32(r)

    return jax.lax.fori_loop(0, iters, body, x)


def solve_dense(a64: jnp.ndarray, b: jnp.ndarray, iters: int = 12
                ) -> jnp.ndarray:
    """One-shot mixed-precision dense solve (small systems, e.g. the P1
    projection mass matrix)."""
    fac = factorize(a64)
    return solve_refined(fac, lambda x: a64 @ x, b, iters)
