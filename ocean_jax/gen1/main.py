"""Gen-1 orchestration driver (``old_dolfinx_files/main.py``, C11).

The class-based gradient-descent loop (``main.py:197-227``):

    for i in range(num_steps):
        w_r   = ns.solve_stokes_step(q)
        w     = ns.state_solving_step(q, u_r, i)
        x     = ode.ode_solving_step(u)
        lam_2 = ode.adjoint_ode_solving_step(u)
        w_adj, J, u_vals = ns.adjoint_state_solving_step(...)
        q ← q − μ(αq − u_adj)          # raw dof update (main.py:221)

Fixed learning rate from config, no line search.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import control as ctrl_mod
from ..fem import (make_space, make_boundary_quad, dirichlet_velocity_bc)
from ..mesh import unit_square_mesh, mark_boundary_facets
from .solvers import NavierStokesSolver, ODESolver
from . import helpers

_EPS = 1e-12


def run(nx: int = 32, K: int = 5, num_steps: int = 10, lr: float = 0.5,
        alpha: float = 1e-2, viscosity: float = 1.0, delta: float = 0.1,
        grad_check: bool = False, verbose: bool = True):
    """Gen-1 style run on the unit square with Γ₁ = {x=0} (inlet marker)."""
    mesh = unit_square_mesh(nx)
    space = make_space(mesh)
    tags = mark_boundary_facets(mesh, lambda x: np.abs(x[:, 0]) < _EPS)
    bq = make_boundary_quad(mesh, tags, tag=1)
    bc = dirichlet_velocity_bc(mesh, space, lambda x: x[:, 0] > _EPS)

    ns = NavierStokesSolver(space, bq, *bc, viscosity=viscosity,
                            alpha=alpha, delta=delta)
    ode = ODESolver(space, K)
    q = ctrl_mod.from_expression(
        space, bq, lambda x: np.stack(
            [x[:, 1] * (1 - x[:, 1]), np.zeros(len(x))], axis=1))

    j_array = []
    for i in range(num_steps):
        if verbose:
            print(f"gen-1 GD iteration {i}")
        w_r = ns.solve_stokes_step(q)                     # main.py:207
        w = ns.state_solving_step(q, None, i)             # main.py:209
        u, _ = space.split(w)
        x = ode.ode_solving_step(u)                       # main.py:211
        lam_2 = ode.adjoint_ode_solving_step(u)           # main.py:213
        w_adj, J, u_vals = ns.adjoint_state_solving_step(
            u, jnp.asarray(lam_2), jnp.asarray(x), ode.h,
            jnp.asarray(ode.u_d), q)                      # main.py:215
        j_array.append(J)

        if grad_check and i == 0:
            zu, _ = space.split(w_adj)
            z = ctrl_mod.from_p2(space, bq, zu)
            g = ctrl_mod.Control(alpha * q.quad - z.quad,
                                 alpha * q.p2 - z.p2)
            dq = ctrl_mod.constant(space, bq, [0.1, 0.1])
            gradj = float(ctrl_mod.boundary_inner(bq, g, dq))
            rows = helpers.test_gradient_centered_finite_differences_NS(
                ns, ode, q, dq, gradj, ks=range(1, 7))
            if verbose:
                for gc, err, h in rows:
                    print(f"  centered FD {gc:+.6e} err {err:.3e} h={h:g}")

        # raw dof update q ← q − μ(αq − u_adj)  (main.py:221)
        zu, _ = space.split(w_adj)
        z = ctrl_mod.from_p2(space, bq, zu)
        q = ctrl_mod.Control(q.quad - lr * (alpha * q.quad - z.quad),
                             q.p2 - lr * (alpha * q.p2 - z.p2))
        if verbose:
            print(f"  J = {J:.6e}")
    return {"J": j_array, "q": q}


if __name__ == "__main__":
    run(num_steps=3)
