"""Coupled NS+ODE gradient-check harness — ``fenics_testing_pipelines/
dolfin_implementation.py`` (C5).

The full coupled-system verification: nonlinear NS on the unit square
(Γ₁ = {x=0} only, no boundary stabilization term — ``:63-64``), buoy
advection with analytic measurements u_d1(t) = 0.5(cos(π(t−0.5)) − 1 −
cos π) (``:85-90``), *implicit* adjoint ODE (I + h∇uᵀ)μ_k = … (``:107-117``,
including its u_d[k] time-index quirk), point-source adjoint RHS, and
FD-vs-adjoint tables over h = 10⁻³ … 10⁻¹¹ written in the reference's
format (``:165-193``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import control as ctrl_mod
from ..adjoint import point_source_rhs
from ..fem import (assemble, make_space, make_boundary_quad,
                   dirichlet_velocity_bc)
from ..io import artifacts
from ..mesh import unit_square_mesh, mark_boundary_facets
from ..ode import solve_primal_ode, solve_adjoint_ode_implicit
from ..solve import newton_solve, solve_operator, GradProjector

_EPS = 1e-12


def build(nx: int = 32, K: int = 5, alpha: float = 1e-2,
          viscosity: float = 1.0, t0: float = 0.0, T: float = 1.0,
          dt: float = 0.005):
    mesh = unit_square_mesh(nx)
    space = make_space(mesh)
    tags = mark_boundary_facets(mesh, lambda x: np.abs(x[:, 0]) < _EPS)
    bq = make_boundary_quad(mesh, tags, tag=1)
    bc_dofs, bc_vals = dirichlet_velocity_bc(
        mesh, space, lambda x: x[:, 0] > _EPS)
    nt = int(T / dt)
    # u_d synthesis (dolfin_implementation.py:85-90): sampled on
    # linspace(t0, T, nt) — the T/(nt-1) spacing quirk
    t = np.linspace(t0, T, nt)
    ud1 = 0.5 * (np.cos(np.pi * (t - 0.5)) - 1 - np.cos(np.pi))
    u_d = np.zeros((K, nt, 2))
    u_d[:, :, 0] = ud1
    x0 = np.stack([np.full(K, 0.2), np.linspace(0.2, 0.9, K)], axis=1)
    return dict(mesh=mesh, space=space, bq=bq, bc=(bc_dofs, bc_vals),
                u_d=jnp.asarray(u_d), x0=jnp.asarray(x0), alpha=alpha,
                nu=viscosity, h=dt, nt=nt,
                projector=GradProjector.build(space),
                center=jnp.asarray([0.5, 0.5]))


def default_control(p) -> ctrl_mod.Control:
    """f = df = ('x[1]*(1-x[1])', '0') (reference :48-50)."""
    return ctrl_mod.from_expression(
        p["space"], p["bq"],
        lambda x: np.stack([x[:, 1] * (1 - x[:, 1]),
                            np.zeros(len(x))], axis=1))


def solve_state(p, f_quad):
    """Newton solve of the C5 form: no viscosity coefficient, no boundary
    stabilization (``dolfin_implementation.py:63-64``)."""
    space, bq, (bc_dofs, bc_vals) = p["space"], p["bq"], p["bc"]

    def residual(w):
        return assemble.ns_residual(space, bq, w, f_quad, 1.0,
                                    boundary_stab=False)

    def operator(w):
        return assemble.ns_operator(space, bq, w, 1.0, bc_dofs,
                                    boundary_stab=False)

    return newton_solve(residual, operator, jnp.zeros(space.ndof),
                        bc_dofs, bc_vals)


def forward(p, f_quad):
    res = solve_state(p, f_quad)
    u, _ = p["space"].split(res.w)
    ode = solve_primal_ode(p["space"], u, p["x0"], p["h"], p["nt"],
                           p["center"])
    return res.w, ode


def cost(p, u_values, f_quad):
    part_a = 0.5 * float(jnp.sum(
        p["h"] * jnp.sum((u_values - p["u_d"]) ** 2, axis=-1)))
    part_b = 0.5 * p["alpha"] * float(jnp.sum(
        p["bq"].weights * jnp.sum(f_quad ** 2, axis=-1)))
    return part_a + part_b


def run(nx: int = 32, K: int = 5, alpha: float = 1e-2,
        out_dir: Optional[str] = None, ks=range(3, 12), verbose=print):
    p = build(nx=nx, K=K, alpha=alpha)
    space, bq = p["space"], p["bq"]
    f = default_control(p)
    df = default_control(p)

    w, ode = forward(p, f.quad)
    u, _ = space.split(w)
    grad_u = p["projector"].project(space, u)
    mu = solve_adjoint_ode_implicit(space, grad_u, u, ode.x, p["u_d"],
                                    p["h"], ud_index="k")
    b = point_source_rhs(space, u, ode.x, mu, p["u_d"],
                         jnp.zeros(K, bool), p["h"], p["center"])
    # C5 adjoint form: volume terms only (dolfin_implementation.py:133)
    op = assemble.adjoint_operator(space, None, w, p["bc"][0])
    z = solve_operator(op, b, p["bc"][1])
    zu, _ = space.split(z)
    z_ctrl = ctrl_mod.from_p2(space, bq, zu)
    g = ctrl_mod.Control(alpha * f.quad - z_ctrl.quad,
                         alpha * f.p2 - z_ctrl.p2)
    gradj = float(ctrl_mod.boundary_inner(bq, g, df))
    j0 = cost(p, ode.u_values, f.quad)
    verbose(f"J0 = {j0}")

    one_rows, cen_rows = [], []
    for k in ks:
        h_ = 10.0 ** (-k)
        _, ode_p = forward(p, f.quad + h_ * df.quad)
        jp = cost(p, ode_p.u_values, f.quad + h_ * df.quad)
        ga = (jp - j0) / h_
        one_rows.append((ga, abs(ga - gradj), h_))
        _, ode_m = forward(p, f.quad - h_ * df.quad)
        jm = cost(p, ode_m.u_values, f.quad - h_ * df.quad)
        gc = (jp - jm) / (2 * h_)
        cen_rows.append((gc, abs(gradj - gc), h_))

    if out_dir is not None:
        import os
        os.makedirs(out_dir, exist_ok=True)
        artifacts.write_grad_table(
            os.path.join(out_dir, "grad_J_error_0.txt"), gradj, one_rows)
        artifacts.write_grad_table(
            os.path.join(out_dir, "grad_J_error_centered_0.txt"), gradj,
            cen_rows)
    return {"gradj": gradj, "J0": j0, "one_sided": one_rows,
            "centered": cen_rows}


if __name__ == "__main__":
    run()
