"""Matrix-free Krylov solvers for the saddle-point systems.

The scaling path past dense-LU territory (SURVEY §7.3 "sparse saddle-point
solve in pure XLA"): the `fem.assemble.Operator` already provides an exact
matrix-free ``matvec64`` (element-level gather→einsum→scatter — the sparse
matrix never exists), so high-resolution solves run FGMRES on it directly.

Preconditioning (round-1 baseline, mesh-dependent):
  * velocity block: Jacobi (operator diagonal, assembled element-wise),
  * pressure block: scaled lumped pressure-mass diagonal (the classical
    Schur-complement approximation for Stokes-like systems).

This replaces PETSc's GMRES/BCGS+Jacobi configurations of gen-1
(``Navier_stokes_solver.py:149-162,302-306``). Geometric multigrid on the
structured mesh is the planned round-2 upgrade for mesh-independent
iteration counts.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..fem.assemble import Operator
from ..fem.spaces import TaylorHoodSpace


def operator_diagonal(op: Operator) -> jnp.ndarray:
    """Diagonal of the assembled operator (with identity BC rows)."""
    d = jnp.zeros(op.n)
    diag_cells = jnp.einsum("caa->ca", op.cell_mats)
    d = d.at[op.cell_dofs].add(diag_cells)
    if op.facet_mats is not None:
        d = d.at[op.facet_dofs].add(
            jnp.einsum("faa->fa", op.facet_mats))
    return d.at[op.bc_dofs].set(1.0)


def jacobi_preconditioner(op: Operator,
                          pressure_scale: Optional[jnp.ndarray] = None
                          ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Block-diagonal preconditioner: 1/diag on the velocity block and a
    (possibly rescaled) diagonal on the pressure block. The saddle operator
    has a zero pressure-pressure block, so its raw diagonal is 0 there —
    ``pressure_scale`` supplies the Schur approximation (lumped pressure
    mass; defaults to 1)."""
    d = operator_diagonal(op)
    safe = jnp.where(jnp.abs(d) > 1e-30, d, 1.0)
    inv = 1.0 / safe
    if pressure_scale is not None:
        inv = inv.at[-pressure_scale.shape[0]:].set(
            1.0 / pressure_scale)
    else:
        # zero-diagonal rows (pressure block) fall back to identity
        inv = jnp.where(jnp.abs(d) > 1e-30, inv, 1.0)
    return lambda x: inv * x


def pressure_mass_lumped(space: TaylorHoodSpace,
                         nu: float = 1.0) -> jnp.ndarray:
    """Lumped P1 pressure mass diagonal scaled by 1/ν — the standard
    Schur-complement approximation for the Stokes block."""
    lumped = jnp.zeros(space.n_p1)
    cell_mass = jnp.einsum("q,qa->a", space.qw, space.phi1)
    vals = cell_mass[None, :] * space.cell_detj[:, None]
    lumped = lumped.at[space.cell_dofs_p1].add(vals)
    return lumped / nu


class FGMRESResult(NamedTuple):
    x: jnp.ndarray
    residual_norm: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


def fgmres(matvec: Callable[[jnp.ndarray], jnp.ndarray],
           b: jnp.ndarray,
           M: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
           x0: Optional[jnp.ndarray] = None,
           restart: int = 60,
           max_restarts: int = 10,
           tol: float = 1e-10) -> FGMRESResult:
    """Right-preconditioned restarted GMRES in pure JAX (static shapes,
    jit/vmap/shard_map-compatible — inner loop is a fori_loop over the
    fixed restart length with masked updates)."""
    n = b.shape[0]
    if M is None:
        M = lambda x: x
    if x0 is None:
        x0 = jnp.zeros_like(b)
    tiny = jnp.asarray(jnp.finfo(b.dtype).tiny, b.dtype)  # f32-safe guard
    bnorm = jnp.linalg.norm(b)
    target = tol * jnp.maximum(bnorm, tiny)

    def cycle(carry):
        x, rnorm, it, done = carry
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)
        # Arnoldi with modified Gram-Schmidt, fixed restart length
        V = jnp.zeros((restart + 1, n), b.dtype).at[0].set(
            r / jnp.maximum(beta, tiny))
        Z = jnp.zeros((restart, n), b.dtype)
        H = jnp.zeros((restart + 1, restart), b.dtype)

        def arnoldi(j, state):
            V, Z, H = state
            z = M(V[j])
            w = matvec(z)
            hs = V @ w                      # (restart+1,) MGS coefficients
            mask = (jnp.arange(restart + 1) <= j)
            hs = jnp.where(mask, hs, 0.0)
            w = w - hs @ V
            hnew = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / jnp.maximum(hnew, tiny))
            H = H.at[:, j].set(hs).at[j + 1, j].set(hnew)
            Z = Z.at[j].set(z)
            return (V, Z, H)

        V, Z, H = jax.lax.fori_loop(0, restart, arnoldi, (V, Z, H))
        # least squares min ||beta e1 - H y|| — solved in float64
        # regardless of the Krylov dtype: the (restart+1, restart) system
        # is tiny (emulated-f64 cost is negligible) and f32 SVD both loses
        # accuracy and aborts the TPU remote-compile helper
        e1 = jnp.zeros(restart + 1, jnp.float64).at[0].set(
            beta.astype(jnp.float64))
        y, _, _, _ = jnp.linalg.lstsq(H.astype(jnp.float64), e1)
        y = y.astype(b.dtype)
        x_new = x + y @ Z
        r_new = b - matvec(x_new)
        rnorm_new = jnp.linalg.norm(r_new)
        improved = rnorm_new < rnorm
        x = jnp.where(improved, x_new, x)
        rnorm = jnp.where(improved, rnorm_new, rnorm)
        return (x, rnorm, it + 1, rnorm <= target)

    def cond(carry):
        _, rnorm, it, done = carry
        return (~done) & (it < max_restarts)

    r0 = jnp.linalg.norm(b - matvec(x0))
    x, rnorm, iters, done = jax.lax.while_loop(
        cond, cycle, (x0, r0, jnp.asarray(0), r0 <= target))
    return FGMRESResult(x, rnorm, iters, rnorm <= target)


def solve_operator_krylov(op: Operator, b: jnp.ndarray,
                          bc_vals: jnp.ndarray,
                          space: Optional[TaylorHoodSpace] = None,
                          nu: float = 1.0,
                          tol: float = 1e-10,
                          restart: int = 80,
                          max_restarts: int = 30) -> FGMRESResult:
    """Drop-in Krylov alternative to the dense ``solve_operator`` — for
    resolutions where the dense fp32 factorization no longer fits."""
    from ..fem.assemble import apply_bc_vector
    b = apply_bc_vector(b, op.bc_dofs, bc_vals)
    pm = pressure_mass_lumped(space, nu) if space is not None else None
    M = jacobi_preconditioner(op, pm)
    return fgmres(op.matvec64, b, M=M, restart=restart,
                  max_restarts=max_restarts, tol=tol)
