"""Native C++ mesh builder: bit-identical to the numpy fallback."""

import numpy as np
import pytest

from ocean_jax import native
from ocean_jax.mesh import (rectangle_mesh, l_shape_mesh, pipe_mesh,
                            unit_square_mesh)
from ocean_jax.mesh.structured import (PIPE_INLET_MARKER, PIPE_WALL_MARKER,
                                       PIPE_OBSTACLE_MARKER)


def test_native_builds():
    assert native.load() is not None, "g++ build of meshgen.cpp failed"


def test_native_matches_numpy_topology():
    lib = native.load()
    if lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    m = l_shape_mesh(resolution=12)
    # numpy fallback on the same cells
    from ocean_jax.mesh import structured as st
    nat = native.build_topology(m.cells)
    assert nat is not None
    edges, cell_edges, b_cell, b_local, bf_v = nat
    # recompute with the numpy path (bypass native)
    nc = m.cells.shape[0]
    e0 = m.cells[:, [1, 2]]; e1 = m.cells[:, [2, 0]]; e2 = m.cells[:, [0, 1]]
    all_edges = np.sort(np.concatenate([e0, e1, e2]), axis=1)
    uniq, inverse, counts = np.unique(all_edges, axis=0,
                                      return_inverse=True,
                                      return_counts=True)
    assert np.array_equal(edges, uniq)
    assert np.array_equal(cell_edges, inverse.reshape(3, nc).T)
    assert np.array_equal(np.sort(np.asarray(b_cell)),
                          np.sort(m.bf_cells))
    # the Mesh2D built through the native path equals stored arrays
    assert np.array_equal(np.asarray(m.cell_edges), cell_edges)


def test_native_triangulation_matches():
    lib = native.load()
    if lib is None:
        pytest.skip("native lib unavailable")
    xs = np.linspace(0.0, 2.0, 7)
    ys = np.linspace(0.0, 2.0, 7)
    active = np.ones((6, 6), dtype=bool)
    active[4, 1] = False
    for diag in ("right", "left"):
        nat = native.build_triangulation(xs, ys, active, diag)
        assert nat is not None
        v_n, c_n, s2c_n = nat
        # numpy reference
        from ocean_jax.mesh.structured import _triangulate
        import ocean_jax.native as nt
        saved = nt._lib
        try:
            nt._lib = None
            nt._tried = True
            v_p, c_p, s2c_p = _triangulate(active, xs, ys, diag)
        finally:
            nt._lib = saved
        assert np.allclose(v_n, v_p)
        assert np.array_equal(c_n, c_p)
        assert np.array_equal(s2c_n, s2c_p)


def test_pipe_mesh():
    mesh, tags = pipe_mesh(resolution=20, obstacle=True)
    assert mesh.hole == (0.2, 0.2, 0.05)
    assert (tags == PIPE_OBSTACLE_MARKER).sum() > 0
    assert (tags == PIPE_INLET_MARKER).sum() == 2 * 20
    assert (tags == PIPE_WALL_MARKER).sum() == 2 * 20
    # area = 4 minus the removed squares around the obstacle
    v = mesh.cell_vertices()
    areas = 0.5 * np.abs(
        (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
        - (v[:, 1, 1] - v[:, 0, 1]) * (v[:, 2, 0] - v[:, 0, 0]))
    assert 3.9 < areas.sum() < 4.0
    # in_domain excludes the hole
    import jax.numpy as jnp
    from ocean_jax.mesh.locate import Locator, in_domain
    loc = Locator.from_mesh(mesh)
    ok = np.asarray(in_domain(loc, jnp.array([[0.2, 0.2], [1.0, 1.0]])))
    assert list(ok) == [False, True]
