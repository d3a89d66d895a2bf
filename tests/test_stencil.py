"""Offset-stencil matvec (ops/stencil.py) vs the element scatter matvec —
the structured-grid replacement for sparse CSR MatMult in the Krylov path
(reference delegates to PETSc, ``OCP_dolfin.py:325,371``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.mesh import structured
from ocean_jax.mesh.structured import mark_boundary_facets
from ocean_jax.fem import assemble
from ocean_jax.fem.spaces import make_space, make_boundary_quad, \
    dirichlet_velocity_bc
from ocean_jax.ops import stencil
from ocean_jax.solve import mg as mg_mod

EPS = 1e-12


def _setup(mesh):
    space = make_space(mesh)
    ftags = mark_boundary_facets(mesh, lambda x: np.abs(x[:, 0]) < EPS)
    bq = make_boundary_quad(mesh, ftags, tag=1)
    bc_dofs, _ = dirichlet_velocity_bc(mesh, space,
                                       lambda x: x[:, 0] > EPS)
    rng = np.random.default_rng(0)
    w = jnp.asarray(0.3 * rng.standard_normal(space.ndof))
    op = assemble.ns_operator(space, bq, w, 1.0, bc_dofs)
    return space, bq, op


MESHES = [
    ("square", structured.unit_square_mesh(7)),
    ("rect", structured.rectangle_mesh((0., 0.), (2., 2.), 6, 6)),
    ("lshape", structured.l_shape_mesh(8)),
    ("pipe-graded", structured.pipe_mesh(obstacle=False, graded=True,
                                         lc_min=0.1, lc_max=0.35)[0]),
    ("pipe-hole", structured.pipe_mesh(resolution=10, obstacle=True)[0]),
]


@pytest.mark.parametrize("name,mesh", MESHES)
@pytest.mark.slow
def test_mixed_matvec_matches_scatter(name, mesh):
    space, bq, op = _setup(mesh)
    st = stencil.build_stencil_tables(space, bq, "mixed")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(space.ndof))

    ref64 = op.matvec64(x)
    got64 = stencil.matvec_of(st, jnp.float64)(op)(x)
    assert float(jnp.max(jnp.abs(got64 - ref64))) < 1e-11, name

    ref32 = mg_mod.op_matvec(op, jnp.float32)(x.astype(jnp.float32))
    got32 = stencil.matvec_of(st, jnp.float32)(op)(x)
    scale = float(jnp.max(jnp.abs(ref32)))
    assert float(jnp.max(jnp.abs(got32 - ref32))) < 1e-4 * scale, name


@pytest.mark.parametrize("name,mesh", MESHES[:3])
def test_velocity_block_matvec_matches_scatter(name, mesh):
    space, bq, op = _setup(mesh)
    n_vel = 2 * space.n_p2
    vel = mg_mod.velocity_block(op, n_vel)
    st = stencil.build_stencil_tables(space, bq, "vel")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(n_vel))

    ref = mg_mod.op_matvec(vel, jnp.float64)(x)
    got = stencil.matvec_of(st, jnp.float64)(vel)(x)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-11, name


@pytest.mark.slow
def test_mg_matvec_knob_switches_paths():
    """mg_matvec="scatter" builds contexts without stencil tables and the
    two configurations solve to the same answer."""
    import dataclasses
    from ocean_jax.config import OCPConfig
    from ocean_jax import system as sys_mod

    cfg = OCPConfig(unit_square_resolution=12, ud_experiment="2_buoys",
                    T=0.05, dt=0.005, linear_solver="mg")
    rng = np.random.default_rng(5)
    u_d = 0.05 * rng.standard_normal((2, cfg.num_time_steps, 2))
    x0 = 0.4 + 1.2 * rng.random((2, 2))
    p_st = sys_mod.build_problem(cfg, u_d=u_d, x0=x0)
    p_sc = sys_mod.build_problem(
        dataclasses.replace(cfg, mg_matvec="scatter"), u_d=u_d, x0=x0)
    assert p_st.mg.st_mixed is not None and p_st.mg.st_vel is not None
    assert p_sc.mg.st_mixed is None and p_sc.mg.st_vel is None
    f = sys_mod.initial_control(p_st, case=0)
    a = sys_mod.solve_ns(p_st, f.quad)
    b = sys_mod.solve_ns(p_sc, f.quad)
    assert bool(a.converged) and bool(b.converged)
    assert float(jnp.max(jnp.abs(a.w - b.w))) < 1e-9


def test_facet_free_operator():
    """Stokes velocity operator without boundary terms pairs with tables
    built with bq=None."""
    mesh = structured.unit_square_mesh(6)
    space = make_space(mesh)
    bc_dofs, _ = dirichlet_velocity_bc(mesh, space,
                                       lambda x: x[:, 0] > EPS)
    op = assemble.ns_operator(space, None, jnp.zeros(space.ndof), 1.0,
                              bc_dofs, convection=False)
    st = stencil.build_stencil_tables(space, None, "mixed")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(space.ndof))
    ref = op.matvec64(x)
    got = stencil.matvec_of(st, jnp.float64)(op)(x)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-12
