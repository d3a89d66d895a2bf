"""Locally-graded tensor-product meshing — the structured analog of
gen-1's gmsh distance-field size control near the pipe obstacle
(``old_dolfinx_files/mesh_init.py:145-172``: LcMin = r/3 within distance
r of the obstacle, ramping to MeshSizeMax = 0.09 at distance 2H).

The graded grid keeps the whole TPU stack working unchanged: per-cell
Jacobian assembly is already general, and point location switches to a
vectorized searchsorted over the grid lines (``mesh/locate.py``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ocean_jax.mesh import structured
from ocean_jax.mesh.locate import locate_points
from ocean_jax.fem.spaces import make_space, make_boundary_quad, \
    dirichlet_velocity_bc
from ocean_jax.mesh.structured import (PIPE_INLET_MARKER, PIPE_WALL_MARKER,
                                       PIPE_OBSTACLE_MARKER)


def test_graded_lines_threshold_law():
    xs = structured.graded_lines(0.0, 2.0, 0.2, 0.05 / 3, 0.09, 0.05, 4.0)
    dx = np.diff(xs)
    assert xs[0] == 0.0 and xs[-1] == 2.0
    assert np.all(dx > 0)
    i = np.searchsorted(xs, 0.2)
    # lc_min resolution inside the obstacle neighbourhood
    assert dx[max(i - 2, 0):i + 1].max() < 0.05 / 3 + 1e-9
    # ramp: spacing grows away from the obstacle but respects the cap
    assert dx.max() <= 0.09 + 1e-9
    assert dx.max() > 2.5 * dx.min()


def test_graded_pipe_mesh_saves_dofs_and_locates():
    mesh, tags = structured.pipe_mesh(obstacle=True, graded=True)
    assert not mesh.uniform
    sp = make_space(mesh)

    # ~6x finer near the obstacle than far field, at a fraction of the
    # uniform-lc_min dof count
    mu, _ = structured.pipe_mesh(resolution=120, obstacle=True)
    spu = make_space(mu)
    assert sp.ndof < 0.5 * spu.ndof

    # boundary tagging identical to the uniform path
    assert (tags == PIPE_INLET_MARKER).sum() > 0
    assert (tags == PIPE_WALL_MARKER).sum() > 0
    assert (tags == PIPE_OBSTACLE_MARKER).sum() > 0

    # searchsorted locate: every inside point whose square is active
    # reconstructs exactly from its owning cell's affine map
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 2, (1500, 2))
    cell, xi, inside = locate_points(sp.locator, jnp.asarray(pts))
    cell, xi, inside = np.asarray(cell), np.asarray(xi), np.asarray(inside)
    loc = sp.locator
    xs, ys = np.asarray(loc.xs_lines), np.asarray(loc.ys_lines)
    ix = np.clip(np.searchsorted(xs, pts[:, 0], side="right") - 1,
                 0, len(xs) - 2)
    iy = np.clip(np.searchsorted(ys, pts[:, 1], side="right") - 1,
                 0, len(ys) - 2)
    active = np.asarray(loc.square_to_cell)[iy, ix].min(axis=1) >= 0
    verts = mesh.vertices[mesh.cells]
    sel = inside & active
    v = verts[cell[sel]]
    rec = (v[:, 0] + xi[sel, 0:1] * (v[:, 1] - v[:, 0])
           + xi[sel, 1:2] * (v[:, 2] - v[:, 0]))
    assert sel.sum() > 1000
    assert np.abs(rec - pts[sel]).max() < 1e-12
    assert xi[sel].min() > -1e-9 and xi[sel].sum(1).max() < 1 + 1e-9


def test_graded_mesh_stokes_solve():
    """The gen-1 solver stack runs unchanged on a graded pipe mesh
    (coarsened lc values — same grading law, CPU-test-sized dense solve)."""
    from ocean_jax import control as ctrl_mod
    from ocean_jax.mesh.structured import mark_boundary_facets
    from ocean_jax.gen1 import NavierStokesSolver

    eps = 1e-12
    mesh, tags = structured.pipe_mesh(obstacle=False, graded=True,
                                      lc_min=0.08, lc_max=0.3)
    assert not mesh.uniform
    space = make_space(mesh)
    ftags = mark_boundary_facets(mesh, lambda x: np.abs(x[:, 0]) < eps)
    bq = make_boundary_quad(mesh, ftags, tag=1)
    bc = dirichlet_velocity_bc(mesh, space, lambda x: x[:, 0] > eps)
    ns = NavierStokesSolver(space, bq, *bc, alpha=1e-2)
    q = ctrl_mod.from_expression(
        space, bq, lambda x: np.stack(
            [x[:, 1] * (2 - x[:, 1]) / 4, np.zeros(len(x))], axis=1))
    w = ns.solve_stokes_step(q)
    u, p = space.split(w)
    assert bool(jnp.isfinite(u).all()) and bool(jnp.isfinite(p).all())
    assert float(jnp.abs(u).max()) > 1e-6      # flow actually driven
    # Taylor–Hood velocities are only WEAKLY divergence-free; ‖div u‖_L²
    # is O(h)-small, not machine-zero (the reference's own golden runs
    # carry ~0.24 at Nx=32, reference_runs/*/u_divergence.txt)
    from ocean_jax.fem import assemble
    assert float(assemble.divergence_l2(space, u)) < 0.05


@pytest.mark.slow
def test_pallas_backend_runs_on_graded_mesh():
    """Round-3 tail: the fused Pallas kernel runs on graded tensor
    meshes via the in-kernel searchsorted (exact hi/lo grid-line table,
    comparison-count interval location, one-hot endpoint selection) and
    matches the f64 gather backend within the double-single bar."""
    from ocean_jax.ode.grideval import make_grideval
    from ocean_jax.ode.pallas_ode import solve_primal_ode_pallas
    from ocean_jax.ode.primal import solve_primal_ode
    mesh, _ = structured.pipe_mesh(obstacle=False, graded=True,
                                   lc_min=0.08, lc_max=0.3)
    sp = make_space(mesh)
    ge = make_grideval(sp)
    assert ge.hg_shape == (2 * sp.locator.grid_shape[1] + 1,
                           2 * sp.locator.grid_shape[0] + 1)
    rng = np.random.default_rng(3)
    u = jnp.asarray(0.5 * rng.standard_normal((sp.n_p2, 2)))
    K, nt, h = 17, 40, 0.02
    x0 = jnp.asarray(rng.uniform(0.1, 1.9, (K, 2)))
    center = jnp.asarray([1.0, 1.0])
    ref = solve_primal_ode(sp, u, x0, h, nt, center)
    pal = solve_primal_ode_pallas(sp, ge, u, x0, h, nt, center)
    assert bool(jnp.all(pal.mask == ref.mask))
    assert bool(jnp.all(pal.kfail == ref.kfail))
    assert float(jnp.max(jnp.abs(pal.x - ref.x))) < 1e-9
    assert float(jnp.max(jnp.abs(pal.u_values - ref.u_values))) < 1e-9
