"""End-to-end slice: Stokes solve + adjoint gradient verification.

The discrete analog of the reference's canonical correctness harness
(``fenics_testing_pipelines/Stokes_gradient_check_dolfin.py``): the adjoint
reduced gradient must agree with centered finite differences of the full
forward pipeline, and with ``jax.grad`` of the jitted forward map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.pipelines import stokes_gradcheck as sg
from ocean_jax.fem import assemble


def test_stokes_solver_residual_and_bc():
    prob = sg.build(nx=12)
    f = sg.default_control(prob)
    w = sg.solve_state(prob, f.quad)
    # residual of the linear system is tiny (refined to fp64)
    b = assemble.boundary_load(prob.space, prob.bq, f.quad)
    b = assemble.apply_bc_vector(b, prob.bc_dofs, prob.bc_vals)
    r = b - prob.op.matvec64(w)
    assert float(jnp.linalg.norm(r)) < 1e-11 * max(1.0,
                                                   float(jnp.linalg.norm(b)))
    # Dirichlet dofs are zero (up to refinement noise)
    assert float(jnp.abs(w[prob.bc_dofs]).max()) < 1e-14
    # the flow is nontrivial
    u, p = prob.space.split(w)
    assert float(jnp.abs(u).max()) > 1e-3


def test_stokes_gradient_fd_closure_fast():
    """Default-tier canonical closure check (the full-ladder nx=16
    variant below is `slow`): centered FD matches the adjoint gradient
    to ~1e-8 relative at the two most accurate step sizes."""
    prob = sg.build(nx=10)
    res = sg.gradient_tables(prob, ks=range(4, 6))
    gradj = res["gradj"]
    assert abs(gradj) > 1e-6
    errs = {h: err for _, err, h in res["centered"]}
    assert errs[1e-5] / abs(gradj) < 1e-8
    assert 0 < res["div_l2"] < 1.0


@pytest.mark.slow
def test_stokes_gradient_fd_closure():
    prob = sg.build(nx=16)
    res = sg.gradient_tables(prob, ks=range(3, 9))
    gradj = res["gradj"]
    assert abs(gradj) > 1e-6
    # centered FD at h=1e-5 must match the adjoint gradient to ~1e-9 rel
    errs = {h: err for _, err, h in res["centered"]}
    assert errs[1e-5] / abs(gradj) < 1e-8
    # one-sided FD behaves like O(h)
    one = {h: err for _, err, h in res["one_sided"]}
    assert one[1e-4] < one[1e-3]
    # divergence of the discrete velocity is small but nonzero
    assert 0 < res["div_l2"] < 1.0


def test_stokes_gradient_vs_jax_grad():
    """The adjoint gradient equals jax.grad of the jitted forward map —
    the framework-native correctness check (SURVEY §7.2 step 5)."""
    prob = sg.build(nx=12)
    f = sg.default_control(prob)
    df = sg.default_control(prob)

    def j_of_f(fq):
        w = sg.solve_state(prob, fq)
        return sg.cost(prob, w, fq)

    g_auto = jax.grad(j_of_f)(f.quad)
    directional = float(jnp.sum(g_auto * df.quad))
    res = sg.gradient_tables(prob, ks=range(5, 6))
    assert np.isclose(directional, res["gradj"], rtol=1e-9)
