"""Gen-1 facade: the class-based API runs and its gradient check closes."""

import numpy as np
import pytest

from ocean_jax.gen1 import main as g1main


@pytest.mark.slow
def test_gen1_driver_runs_and_descends():
    r = g1main.run(nx=8, K=3, num_steps=3, lr=0.5, grad_check=False,
                   verbose=False)
    j = r["J"]
    assert len(j) == 3
    assert j[-1] < j[0]            # fixed-LR descent reduces the cost
    assert np.isfinite(j).all()


@pytest.mark.slow
def test_gen1_gradient_check():
    """The gen-1 FD helpers close against the gen-1 adjoint gradient at
    that generation's consistency level."""
    import jax.numpy as jnp
    from ocean_jax import control as ctrl_mod
    from ocean_jax.fem import (make_space, make_boundary_quad,
                               dirichlet_velocity_bc)
    from ocean_jax.mesh import unit_square_mesh, mark_boundary_facets
    from ocean_jax.gen1 import NavierStokesSolver, ODESolver, helpers

    eps = 1e-12
    mesh = unit_square_mesh(8)
    space = make_space(mesh)
    tags = mark_boundary_facets(mesh, lambda x: np.abs(x[:, 0]) < eps)
    bq = make_boundary_quad(mesh, tags, tag=1)
    bc = dirichlet_velocity_bc(mesh, space, lambda x: x[:, 0] > eps)
    ns = NavierStokesSolver(space, bq, *bc, alpha=1e-2)
    ode = ODESolver(space, K=3)
    q = ctrl_mod.from_expression(
        space, bq, lambda x: np.stack(
            [x[:, 1] * (1 - x[:, 1]), np.zeros(len(x))], axis=1))
    w = ns.state_solving_step(q)
    u, _ = space.split(w)
    x = ode.ode_solving_step(u)
    lam = ode.adjoint_ode_solving_step(u)
    w_adj, J, _ = ns.adjoint_state_solving_step(
        u, jnp.asarray(lam), jnp.asarray(x), ode.h,
        jnp.asarray(ode.u_d), q)
    zu, _ = space.split(w_adj)
    z = ctrl_mod.from_p2(space, bq, zu)
    g = ctrl_mod.Control(1e-2 * q.quad - z.quad, 1e-2 * q.p2 - z.p2)
    dq = ctrl_mod.constant(space, bq, [0.1, 0.1])
    gradj = float(ctrl_mod.boundary_inner(bq, g, dq))
    rows = helpers.test_gradient_centered_finite_differences_NS(
        ns, ode, q, dq, gradj, ks=range(3, 6))
    best_rel = min(err for _, err, _ in rows) / abs(gradj)
    # gen-1's adjoint (implicit ODE with u_d[k], nodal-vs-L2 ∇u) is the
    # roughest of the three generations; ~10% consistency is its level
    assert best_rel < 0.2, best_rel
