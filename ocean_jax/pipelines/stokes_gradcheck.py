"""Stokes gradient-check pipeline — the canonical verification harness.

Reimplements ``fenics_testing_pipelines/Stokes_gradient_check_dolfin.py``
(reference C4, SURVEY §2.1): linear Stokes on the unit square (Nx=32),
Neumann control on Γ₁ = {x=0} ∪ {x=1}, tracking cost vs the constant field
u_d = (1,1), adjoint-based reduced gradient vs one-sided and centered finite
differences over h = 1e-3 … 1e-11, plus the ‖div u‖_{L²} check.

All solves are jitted; the FD sweep re-uses one LU factorization of the
(control-independent) Stokes operator — an optimization the reference's
repeated ``solve(a == F)`` cannot express.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import control as ctrl_mod
from ..fem import (make_space, make_boundary_quad, dirichlet_velocity_bc,
                   assemble)
from ..fem.spaces import TaylorHoodSpace, BoundaryQuad
from ..mesh import unit_square_mesh, mark_boundary_facets
from ..ops import linalg

_EPS = 1e-12


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StokesProblem:
    space: TaylorHoodSpace
    bq: BoundaryQuad
    bc_dofs: jnp.ndarray
    bc_vals: jnp.ndarray
    op: assemble.Operator
    fac: linalg.LUSolver
    alpha: float
    ud: jnp.ndarray

    def tree_flatten(self):
        return ((self.space, self.bq, self.bc_dofs, self.bc_vals, self.op,
                 self.fac, self.ud), (self.alpha,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:6], aux[0], children[6])


def build(nx: int = 32, alpha: float = 1e-2) -> StokesProblem:
    mesh = unit_square_mesh(nx)
    space = make_space(mesh)
    # Γ₁ = {x=0} ∪ {x=1}  (Stokes_gradient_check_dolfin.py:11-14)
    tags = mark_boundary_facets(
        mesh, lambda x: (np.abs(x[:, 0]) < _EPS)
        | (np.abs(1.0 - x[:, 0]) < _EPS))
    bq = make_boundary_quad(mesh, tags, tag=1)
    # Dirichlet on the rest (x>eps and |1-x|>eps), value (0,0)  (:42-47)
    bc_dofs, bc_vals = dirichlet_velocity_bc(
        mesh, space,
        lambda x: (x[:, 0] > _EPS) & (np.abs(1.0 - x[:, 0]) > _EPS))
    w0 = jnp.zeros(space.ndof)
    # Stokes bilinear form: no convection, no boundary term, nu=1  (:37)
    op = assemble.ns_operator(space, None, w0, 1.0, bc_dofs, convection=False)
    fac = linalg.factorize(op.dense())
    return StokesProblem(space, bq, bc_dofs, bc_vals, op, fac,
                         alpha, jnp.asarray([1.0, 1.0]))


def default_control(prob: StokesProblem) -> ctrl_mod.Control:
    """f = df = ('x[1]*(1-x[1])', '0')  (reference :25-27)."""
    return ctrl_mod.from_expression(
        prob.space, prob.bq,
        lambda x: np.stack([x[:, 1] * (1 - x[:, 1]),
                            np.zeros(len(x))], axis=1))


@jax.jit
def solve_state(prob: StokesProblem, f_quad: jnp.ndarray) -> jnp.ndarray:
    """Solve the Stokes system for a control (quad values)."""
    b = assemble.boundary_load(prob.space, prob.bq, f_quad)
    b = assemble.apply_bc_vector(b, prob.bc_dofs, prob.bc_vals)
    return linalg.solve_refined(prob.fac, prob.op.matvec64, b)


@jax.jit
def solve_adjoint(prob: StokesProblem, w: jnp.ndarray) -> jnp.ndarray:
    """Adjoint solve: same operator, RHS ∫(u-u_d)·v dx (reference :61-63)."""
    u, _ = prob.space.split(w)
    b = assemble.volume_tracking_rhs(prob.space, u, prob.ud)
    b = assemble.apply_bc_vector(b, prob.bc_dofs, prob.bc_vals)
    return linalg.solve_refined(prob.fac, prob.op.matvec64, b)


@jax.jit
def cost(prob: StokesProblem, w: jnp.ndarray,
         f_quad: jnp.ndarray) -> jnp.ndarray:
    """J = ∫0.5|u-u_d|²dx + α/2 ∫|f|²ds  (reference :50-53)."""
    u, _ = prob.space.split(w)
    part_a = assemble.l2_tracking_volume(prob.space, u, prob.ud)
    part_b = 0.5 * prob.alpha * jnp.sum(
        prob.bq.weights * jnp.sum(f_quad ** 2, axis=-1))
    return part_a + part_b


def gradient_tables(prob: StokesProblem,
                    f: Optional[ctrl_mod.Control] = None,
                    df: Optional[ctrl_mod.Control] = None,
                    ks=range(3, 12)):
    """Adjoint gradient vs FD tables (reference :56-88).

    Returns dict with gradj, one-sided and centered rows (gradapprox, error,
    h), and the divergence check.
    """
    f = default_control(prob) if f is None else f
    df = default_control(prob) if df is None else df
    w = solve_state(prob, f.quad)
    j0 = cost(prob, w, f.quad)
    z = solve_adjoint(prob, w)
    zu, _ = prob.space.split(z)
    z_ctrl = ctrl_mod.from_p2(prob.space, prob.bq, zu)
    # gradj = ∫ (z + αf)·df ds  (reference :64)
    gradj = float(ctrl_mod.boundary_inner(
        prob.bq, ctrl_mod.Control(z_ctrl.quad + prob.alpha * f.quad,
                                  z_ctrl.p2 + prob.alpha * f.p2), df))

    one_sided, centered = [], []
    for k in ks:
        h = 10.0 ** (-k)
        w_p = solve_state(prob, f.quad + h * df.quad)
        j_p = float(cost(prob, w_p, f.quad + h * df.quad))
        ga = (j_p - float(j0)) / h
        one_sided.append((ga, abs(ga - gradj), h))
        w_m = solve_state(prob, f.quad - h * df.quad)
        j_m = float(cost(prob, w_m, f.quad - h * df.quad))
        gc = (j_p - j_m) / (2 * h)
        centered.append((gc, abs(gc - gradj), h))

    u, _ = prob.space.split(w)
    div_l2 = float(assemble.divergence_l2(prob.space, u))
    return {"gradj": gradj, "J0": float(j0), "one_sided": one_sided,
            "centered": centered, "div_l2": div_l2, "w": w, "z": z}


def run(nx: int = 32, alpha: float = 1e-2, out=print):
    """CLI-style entry point mirroring the reference script's stdout."""
    prob = build(nx, alpha)
    res = gradient_tables(prob)
    out("Gradient, one sided Approximation, Error, h")
    for ga, err, h in res["one_sided"]:
        out(f"{res['gradj']} {ga} {err} {h}")
    out("")
    out("Gradient, symmetric Approximation, Error, h")
    for gc, err, h in res["centered"]:
        out(f"{res['gradj']} {gc} {err} {h}")
    out("")
    out(f"||div u||_L2 =  {res['div_l2']}")
    return res
