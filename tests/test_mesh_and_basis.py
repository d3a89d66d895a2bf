"""Unit tests for the mesh layer and reference-element tables."""

import numpy as np
import jax.numpy as jnp
import pytest

from ocean_jax.mesh import (rectangle_mesh, unit_square_mesh, l_shape_mesh,
                            mark_boundary_facets, locate_points)
from ocean_jax.mesh.locate import Locator, in_domain
from ocean_jax.fem import reference as ref
from ocean_jax.fem import make_space, make_boundary_quad
from ocean_jax.fem.interpolate import eval_velocity, interpolate_p2


def test_rectangle_mesh_counts():
    n = 8
    m = rectangle_mesh((0.0, 0.0), (2.0, 2.0), n, n)
    assert m.num_vertices == (n + 1) ** 2
    assert m.num_cells == 2 * n * n
    assert m.num_edges == 3 * n * n + 2 * n
    # total area
    v = m.cell_vertices()
    areas = 0.5 * np.abs(
        (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
        - (v[:, 1, 1] - v[:, 0, 1]) * (v[:, 2, 0] - v[:, 0, 0]))
    assert np.isclose(areas.sum(), 4.0)
    # boundary facets: 4 sides × n facets
    assert m.bf_vertices.shape[0] == 4 * n
    # outward normals have unit length and point outward
    mids = m.facet_midpoints()
    outward = np.einsum("ij,ij->i", m.bf_normals, mids - np.array([1.0, 1.0]))
    assert (outward > 0).all()


def test_l_shape_mesh():
    m = l_shape_mesh(resolution=10)
    v = m.cell_vertices()
    areas = 0.5 * np.abs(
        (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
        - (v[:, 1, 1] - v[:, 0, 1]) * (v[:, 2, 0] - v[:, 0, 0]))
    assert np.isclose(areas.sum(), 3.0)   # [0,2]x[0,1] + [1,2]x[1,2]
    loc = Locator.from_mesh(m)
    pts = jnp.array([[0.5, 0.5], [1.5, 1.5], [0.5, 1.5], [1.0 - 1e-9, 1.5]])
    ok = np.asarray(in_domain(loc, pts))
    assert list(ok) == [True, True, False, False]


def test_p2_partition_of_unity():
    rng = np.random.default_rng(0)
    xi = rng.random((50, 2))
    xi = xi[xi.sum(axis=1) < 1.0]
    assert np.allclose(ref.p2_basis(xi).sum(axis=-1), 1.0)
    assert np.allclose(ref.p2_grad_ref(xi).sum(axis=-2), 0.0)
    # nodal property: value 1 at own node, 0 at others
    nodes = np.array([[0, 0], [1, 0], [0, 1],
                      [0.5, 0.5], [0, 0.5], [0.5, 0]])
    vals = ref.p2_basis(nodes)
    assert np.allclose(vals, np.eye(6), atol=1e-14)


@pytest.mark.parametrize("degree,npts", [(2, 3), (4, 6), (6, 12)])
def test_triangle_quadrature_exactness(degree, npts):
    pts, wts = ref.triangle_quadrature(degree)
    assert len(wts) == npts
    assert np.isclose(wts.sum(), 0.5)
    # exact integration of x^a y^b on ref triangle for a+b <= degree
    for a in range(degree + 1):
        for b in range(degree + 1 - a):
            import math
            num = np.sum(wts * pts[:, 0] ** a * pts[:, 1] ** b)
            exact = (math.factorial(a) * math.factorial(b)
                     / math.factorial(a + b + 2))
            assert np.isclose(num, exact, rtol=1e-12), (a, b)


def test_point_location_and_interpolation():
    for diag in ("right", "left"):
        m = rectangle_mesh((0.0, 0.0), (2.0, 2.0), 8, 8, diagonal=diag)
        space = make_space(m)
        # a quadratic field is represented exactly in P2
        def f(x):
            return np.stack([x[:, 0] ** 2 + x[:, 1],
                             3.0 * x[:, 0] * x[:, 1] - x[:, 1] ** 2], axis=1)
        u = interpolate_p2(space, f)
        rng = np.random.default_rng(1)
        pts = jnp.asarray(rng.random((200, 2)) * 2.0)
        vals, inside = eval_velocity(space, u, pts)
        assert bool(inside.all())
        expect = f(np.asarray(pts))
        assert np.allclose(np.asarray(vals), expect, atol=1e-12)
        # points outside
        _, inside = eval_velocity(space, u, jnp.array([[2.1, 0.5], [-0.1, 0.5]]))
        assert not bool(inside.any())


def test_boundary_marking_gamma1_square():
    # Γ₁ = {x=0} ∪ {x=2} (reference OCP_dolfin.py:118-121, square case)
    n = 8
    m = rectangle_mesh((0.0, 0.0), (2.0, 2.0), n, n)
    eps = 1e-12
    tags = mark_boundary_facets(
        m, lambda x: (np.abs(x[:, 0]) < eps) | (np.abs(2.0 - x[:, 0]) < eps))
    assert tags.sum() == 2 * n
    bq = make_boundary_quad(m, tags, tag=1)
    assert bq.num_facets == 2 * n
    # ds(1) total length = 4.0
    assert np.isclose(float(bq.weights.sum()), 4.0)
    # quad points lie on the two vertical sides
    px = np.asarray(bq.points[..., 0]).ravel()
    assert np.all((np.abs(px) < 1e-12) | (np.abs(px - 2.0) < 1e-12))


def test_boundary_quad_trace_integral():
    # ∫_{Γ₁} u·n ds for u = (x, 0) on the unit square with Γ₁ = {x=0}∪{x=1}:
    # left side contributes 0, right side ∫ 1 dy = 1
    n = 4
    m = unit_square_mesh(n)
    space = make_space(m)
    eps = 1e-12
    tags = mark_boundary_facets(
        m, lambda x: (np.abs(x[:, 0]) < eps) | (np.abs(1.0 - x[:, 0]) < eps))
    bq = make_boundary_quad(m, tags, tag=1)
    u = interpolate_p2(space, lambda x: np.stack(
        [x[:, 0], np.zeros(len(x))], axis=1))
    dofs = space.cell_dofs_p2[bq.cells]
    u_q = jnp.einsum("fqa,fai->fqi", bq.phi2, u[dofs])
    un = jnp.einsum("fqi,fi->fq", u_q, bq.normals)
    val = float(jnp.sum(bq.weights * un))
    assert np.isclose(val, 1.0, atol=1e-13)


def test_incidence_gather_equals_scatter():
    """The transpose-incidence gather reduction (fem/spaces.py::
    _mixed_incidence + assemble.scatter_vector(inc=...)) sums exactly the
    same element contributions per dof as the scatter-add form — only the
    accumulation order (reassociation) may differ, so integer-valued
    contributions must agree bitwise and float ones to roundoff."""
    from ocean_jax.fem import assemble

    m = unit_square_mesh(5)
    space = make_space(m)
    nc, k = space.cell_dofs_mixed.shape
    rng = np.random.default_rng(3)
    vals = jnp.asarray(rng.standard_normal((nc, k)))

    scat = assemble.scatter_vector(space.ndof, space.cell_dofs_mixed, vals)
    gath = assemble.scatter_vector(space.ndof, space.cell_dofs_mixed, vals,
                                   inc=space.inc_mixed)
    assert gath.shape == scat.shape
    assert float(jnp.max(jnp.abs(gath - scat))) < 1e-14

    # integer-valued contributions: any dropped/duplicated incidence
    # entry would show as an exact count mismatch
    ones = jnp.ones((nc, k))
    counts = assemble.scatter_vector(space.ndof, space.cell_dofs_mixed,
                                     ones, inc=space.inc_mixed)
    ref_counts = np.zeros(space.ndof)
    np.add.at(ref_counts, np.asarray(space.cell_dofs_mixed).reshape(-1), 1.0)
    assert np.array_equal(np.asarray(counts), ref_counts)

    # max incidence on the structured triangulation: vertex dofs touch
    # ≤6 cells, edge dofs 2 (documented in _mixed_incidence)
    assert space.inc_mixed.shape[0] == 6
