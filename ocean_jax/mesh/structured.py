"""Structured triangulations of rectangle unions.

TPU-native replacement for ``dolfin.RectangleMesh`` / ``dolfin.UnitSquareMesh``
(reference ``OCP_dolfin.py:99``, ``Stokes_gradient_check_dolfin.py:6``) and the
mshr/CGAL L-shape meshing (``OCP_dolfin.py:82-84``): instead of an opaque C++
mesh object, the mesh is a set of plain arrays (vertices, cells, edges,
boundary facets) plus structured-grid metadata that gives O(1) point-to-cell
location (``ocean_jax.mesh.locate``).

The triangulation of each grid square follows dolfin's ``diagonal`` options
("right" is the dolfin default — the diagonal runs from the lower-left to the
upper-right corner). The L-shape domain
``[0,2]x[0,1] ∪ [1,2]x[1,2]`` matches the rectangle union at
``OCP_dolfin.py:82-84``; the reference meshes it unstructured with mshr —
capability parity, not element-for-element equality, is the target there
(SURVEY §7.3).

All construction is host-side numpy at setup time; consumers convert to
device arrays once.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class Mesh2D:
    """A 2-D triangle mesh with structured-grid lookup metadata.

    Local conventions (used consistently by the FEM layer):
      * cell vertices are counter-clockwise (positive Jacobian determinant),
      * local edge/facet ``i`` connects local vertices ``(i+1)%3`` and
        ``(i+2)%3`` (the edge opposite vertex ``i``) — the standard P2
        midpoint-dof convention.
    """

    vertices: np.ndarray        # (nv, 2) float64
    cells: np.ndarray           # (nc, 3) int32, CCW
    edges: np.ndarray           # (ne, 2) int32, sorted vertex pairs
    cell_edges: np.ndarray      # (nc, 3) int32, edge opposite local vertex i

    # boundary facets
    bf_vertices: np.ndarray     # (nbf, 2) int32
    bf_cells: np.ndarray        # (nbf,) int32 owning cell
    bf_local: np.ndarray        # (nbf,) int32 local facet index in owning cell
    bf_normals: np.ndarray      # (nbf, 2) float64 outward unit normals

    # structured-grid lookup
    origin: Tuple[float, float]
    spacing: Tuple[float, float]
    grid_shape: Tuple[int, int]         # (nx, ny) squares
    square_to_cell: np.ndarray          # (ny, nx, 2) int32; -1 = inactive
    diagonal: str                        # "right" | "left"

    # domain description (for the jittable inside-domain predicate)
    domain: str                          # "rect" | "lshape" | "pipe"
    extent: Tuple[float, float, float, float]   # xmin, ymin, xmax, ymax
    lshape_corner: Tuple[float, float] = (1.0, 1.0)  # inner corner (x, y)
    hole: Optional[Tuple[float, float, float]] = None  # (cx, cy, r) obstacle
    # tensor-product grid lines; non-None ⇒ locally-graded (non-uniform)
    # spacing, and point location switches to the searchsorted path
    # (mesh/locate.py). Uniform meshes keep xs/ys = None and the O(1)
    # closed-form locate.
    xs: Optional[np.ndarray] = None      # (nx+1,) grid x-lines
    ys: Optional[np.ndarray] = None      # (ny+1,) grid y-lines

    @property
    def uniform(self) -> bool:
        return self.xs is None

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edges.shape[0]

    def cell_vertices(self) -> np.ndarray:
        """(nc, 3, 2) coordinates of each cell's vertices."""
        return self.vertices[self.cells]

    def facet_midpoints(self) -> np.ndarray:
        return 0.5 * (self.vertices[self.bf_vertices[:, 0]]
                      + self.vertices[self.bf_vertices[:, 1]])

    def facet_lengths(self) -> np.ndarray:
        d = (self.vertices[self.bf_vertices[:, 1]]
             - self.vertices[self.bf_vertices[:, 0]])
        return np.linalg.norm(d, axis=1)


def _triangulate(active: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                 diagonal: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build vertices/cells/square_to_cell from an active-square mask.

    active: (ny, nx) bool. xs: (nx+1,), ys: (ny+1,) grid lines.
    Uses the native C++ builder when available (bit-identical numbering);
    falls back to numpy.
    """
    from .. import native
    nat = native.build_triangulation(xs, ys, active, diagonal)
    if nat is not None:
        return nat
    ny, nx = active.shape
    # grid vertex ids for vertices referenced by at least one active square
    used = np.zeros((ny + 1, nx + 1), dtype=bool)
    iy, ix = np.nonzero(active)
    for dy in (0, 1):
        for dx in (0, 1):
            used[iy + dy, ix + dx] = True
    vid = -np.ones((ny + 1, nx + 1), dtype=np.int64)
    vid[used] = np.arange(used.sum())
    gy, gx = np.nonzero(used)
    vertices = np.stack([xs[gx], ys[gy]], axis=1)

    v00 = vid[iy, ix]
    v10 = vid[iy, ix + 1]
    v01 = vid[iy + 1, ix]
    v11 = vid[iy + 1, ix + 1]
    if diagonal == "right":
        # diagonal v00 -- v11; both triangles CCW
        t0 = np.stack([v00, v10, v11], axis=1)   # below the diagonal (t <= s)
        t1 = np.stack([v00, v11, v01], axis=1)   # above the diagonal
    elif diagonal == "left":
        # diagonal v10 -- v01
        t0 = np.stack([v00, v10, v01], axis=1)   # s + t <= 1
        t1 = np.stack([v10, v11, v01], axis=1)
    else:
        raise ValueError(f"unknown diagonal {diagonal!r}")

    nc_active = iy.shape[0]
    cells = np.empty((2 * nc_active, 3), dtype=np.int64)
    cells[0::2] = t0
    cells[1::2] = t1
    square_to_cell = -np.ones((ny, nx, 2), dtype=np.int64)
    square_to_cell[iy, ix, 0] = np.arange(0, 2 * nc_active, 2)
    square_to_cell[iy, ix, 1] = np.arange(1, 2 * nc_active, 2)
    return vertices, cells, square_to_cell


def _boundary_normals(vertices, cells, bf_vertices, b_cell, b_local):
    """Outward unit normals of boundary facets (rotated CCW tangents,
    flipped away from the opposite vertex)."""
    tang = vertices[bf_vertices[:, 1]] - vertices[bf_vertices[:, 0]]
    normals = np.stack([tang[:, 1], -tang[:, 0]], axis=1)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    opp = vertices[cells[b_cell, b_local]]
    mid = 0.5 * (vertices[bf_vertices[:, 0]] + vertices[bf_vertices[:, 1]])
    flip = np.einsum("ij,ij->i", normals, mid - opp) < 0
    normals[flip] *= -1.0
    return normals


def _build_topology(vertices: np.ndarray, cells: np.ndarray):
    """Edges, cell→edge maps, and boundary facets (with owning cells).
    Native C++ fast path with numpy fallback (identical numbering)."""
    from .. import native
    nat = native.build_topology(cells)
    if nat is not None:
        edges, cell_edges, b_cell, b_local, bf_vertices = nat
        normals = _boundary_normals(vertices, cells, bf_vertices,
                                    b_cell, b_local)
        return edges, cell_edges, bf_vertices, b_cell, b_local, normals
    nc = cells.shape[0]
    # local edge i is opposite local vertex i
    e0 = cells[:, [1, 2]]
    e1 = cells[:, [2, 0]]
    e2 = cells[:, [0, 1]]
    all_edges = np.concatenate([e0, e1, e2], axis=0)          # (3nc, 2)
    sorted_edges = np.sort(all_edges, axis=1)
    edges, inverse, counts = np.unique(
        sorted_edges, axis=0, return_inverse=True, return_counts=True)
    cell_edges = inverse.reshape(3, nc).T.astype(np.int64)     # (nc, 3)

    boundary_edge_ids = np.nonzero(counts == 1)[0]
    # map each boundary edge back to its (cell, local facet)
    is_bnd = counts[inverse] == 1                              # (3nc,)
    flat_idx = np.nonzero(is_bnd)[0]
    b_local = flat_idx // nc
    b_cell = flat_idx % nc
    b_edge = inverse[flat_idx]
    order = np.argsort(b_edge)
    b_local, b_cell, b_edge = b_local[order], b_cell[order], b_edge[order]
    assert np.array_equal(b_edge, np.sort(boundary_edge_ids))

    bf_vertices = np.stack(
        [cells[b_cell, (b_local + 1) % 3], cells[b_cell, (b_local + 2) % 3]],
        axis=1)
    # outward normal: rotate the (CCW-ordered) facet tangent by -90°
    tang = vertices[bf_vertices[:, 1]] - vertices[bf_vertices[:, 0]]
    normals = np.stack([tang[:, 1], -tang[:, 0]], axis=1)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    # sanity: normal must point away from the opposite vertex
    opp = vertices[cells[b_cell, b_local]]
    mid = 0.5 * (vertices[bf_vertices[:, 0]] + vertices[bf_vertices[:, 1]])
    flip = np.einsum("ij,ij->i", normals, mid - opp) < 0
    normals[flip] *= -1.0
    return edges, cell_edges, bf_vertices, b_cell, b_local, normals


def _finalize(vertices, cells, square_to_cell, origin, spacing, grid_shape,
              diagonal, domain, extent, lshape_corner=(1.0, 1.0),
              hole=None, xs=None, ys=None) -> Mesh2D:
    # enforce CCW orientation
    v = vertices[cells]
    det = ((v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
           - (v[:, 1, 1] - v[:, 0, 1]) * (v[:, 2, 0] - v[:, 0, 0]))
    assert (det > 0).all(), "triangulation must be CCW"
    edges, cell_edges, bf_v, bf_c, bf_l, bf_n = _build_topology(vertices, cells)
    return Mesh2D(
        vertices=vertices,
        cells=cells.astype(np.int64),
        edges=edges.astype(np.int64),
        cell_edges=cell_edges,
        bf_vertices=bf_v.astype(np.int64),
        bf_cells=bf_c.astype(np.int64),
        bf_local=bf_l.astype(np.int64),
        bf_normals=bf_n,
        origin=origin,
        spacing=spacing,
        grid_shape=grid_shape,
        square_to_cell=square_to_cell,
        diagonal=diagonal,
        domain=domain,
        extent=extent,
        lshape_corner=lshape_corner,
        hole=hole,
        xs=xs,
        ys=ys,
    )


def graded_lines(a: float, b: float, center: float, lc_min: float,
                 lc_max: float, dist_min: float, dist_max: float
                 ) -> np.ndarray:
    """1-D grid lines with gmsh-style distance-threshold size control
    (``old_dolfinx_files/mesh_init.py:145-165``): local spacing lc_min
    within ``dist_min`` of ``center``, ramping linearly to lc_max at
    ``dist_max``. March from ``a`` stepping by the local size, then snap
    the last line to ``b`` (dropping it if the final interval would
    degenerate below lc_min/2)."""
    if not dist_max > dist_min:
        raise ValueError(
            f"graded_lines needs dist_max > dist_min (got {dist_min}, "
            f"{dist_max}) — the ramp divides by their difference")
    pts = [a]
    x = a
    while x < b - 1e-12:
        d = abs(x - center)
        f = min(max((d - dist_min) / (dist_max - dist_min), 0.0), 1.0)
        x = min(x + lc_min + (lc_max - lc_min) * f, b)
        pts.append(x)
    arr = np.asarray(pts)
    # degenerate-final-interval merge against the LOCAL ramped spacing at
    # b (near b the target size may be lc_max; comparing against lc_min
    # would let a relatively tiny last cell survive)
    d_b = abs(b - center)
    f_b = min(max((d_b - dist_min) / (dist_max - dist_min), 0.0), 1.0)
    lc_b = lc_min + (lc_max - lc_min) * f_b
    if len(arr) > 2 and arr[-1] - arr[-2] < 0.5 * lc_b:
        arr = np.delete(arr, -2)
    arr[-1] = b
    return arr


def rectangle_mesh(p0: Tuple[float, float], p1: Tuple[float, float],
                   nx: int, ny: int, diagonal: str = "right") -> Mesh2D:
    """Equivalent of ``dolfin.RectangleMesh(Point(*p0), Point(*p1), nx, ny)``
    (reference ``OCP_dolfin.py:99``)."""
    xs = np.linspace(p0[0], p1[0], nx + 1)
    ys = np.linspace(p0[1], p1[1], ny + 1)
    active = np.ones((ny, nx), dtype=bool)
    vertices, cells, s2c = _triangulate(active, xs, ys, diagonal)
    return _finalize(
        vertices, cells, s2c,
        origin=(p0[0], p0[1]),
        spacing=((p1[0] - p0[0]) / nx, (p1[1] - p0[1]) / ny),
        grid_shape=(nx, ny),
        diagonal=diagonal,
        domain="rect",
        extent=(p0[0], p0[1], p1[0], p1[1]),
    )


def unit_square_mesh(n: int, diagonal: str = "right") -> Mesh2D:
    """Equivalent of ``dolfin.UnitSquareMesh(n, n)``
    (reference ``Stokes_gradient_check_dolfin.py:6``)."""
    return rectangle_mesh((0.0, 0.0), (1.0, 1.0), n, n, diagonal)


def l_shape_mesh(resolution: int = 50, diagonal: str = "right") -> Mesh2D:
    """Structured triangulation of the L-shaped domain
    ``[0,2]x[0,1] ∪ [1,2]x[1,2]`` (the rectangle union meshed with mshr at
    ``OCP_dolfin.py:82-84``). ``resolution`` is the number of squares along
    the long (length-2) axis, so the mesh size is ``2/resolution`` —
    comparable to ``mshr.generate_mesh(rect1+rect2, 50)``."""
    n = resolution
    xs = np.linspace(0.0, 2.0, n + 1)
    ys = np.linspace(0.0, 2.0, n + 1)
    cx = 0.5 * (xs[:-1] + xs[1:])[None, :]
    cy = 0.5 * (ys[:-1] + ys[1:])[:, None]
    active = np.broadcast_to((cy <= 1.0) | (cx >= 1.0), (n, n)).copy()
    vertices, cells, s2c = _triangulate(active, xs, ys, diagonal)
    return _finalize(
        vertices, cells, s2c,
        origin=(0.0, 0.0),
        spacing=(2.0 / n, 2.0 / n),
        grid_shape=(n, n),
        diagonal=diagonal,
        domain="lshape",
        extent=(0.0, 0.0, 2.0, 2.0),
        lshape_corner=(1.0, 1.0),
    )


PIPE_INLET_MARKER = 0
PIPE_OUTLET_MARKER = 1
PIPE_WALL_MARKER = 2
PIPE_OBSTACLE_MARKER = 3


def pipe_mesh(resolution: int = 22, obstacle: bool = False,
              diagonal: str = "right", graded: bool = False,
              lc_min: float = None, lc_max: float = None):
    """Pipe domain [0,2]×[0,2] with tagged boundaries and an optional
    circular obstacle — the capability of gen-1's gmsh pipe meshing
    (``old_dolfinx_files/mesh_init.py:95-194``): inlet = {x=0} ∪ {x=L}
    (marker 0), walls = {y=0} ∪ {y=H} (marker 2), obstacle boundary
    marker 3; obstacle disk at (0.2, 0.2), radius 0.05 (``:97-99``).

    Returns (mesh, facet_tags). ``resolution`` = squares along each axis
    (gmsh used MeshSizeMax 0.09 ≈ 2/22).

    ``graded=True`` reproduces gmsh's distance-field size control
    (``mesh_init.py:145-165``): tensor-product grid lines from
    ``graded_lines`` with LcMin = r/3 within distance r of the obstacle
    center, ramping to LcMax = MeshSizeMax = 0.09 at distance 2H — the
    obstacle boundary layer is resolved ~6× finer than the far field
    without paying the uniform-fine dof count. Point location switches to
    the searchsorted path (the ODE/PointSource layers work unchanged).
    """
    L = H = 2.0
    c_x = c_y = 0.2
    r = 0.05
    n = resolution
    if graded:
        # gmsh defaults: LcMin = r/3, MeshSizeMax cap (:171); overridable
        # (coarser grids keep the grading structure at test-friendly size)
        if lc_min is None:
            lc_min = r / 3
        if lc_max is None:
            lc_max = min(0.25 * H, 0.09)
        xs = graded_lines(0.0, L, c_x, lc_min, lc_max, r, 2 * H)
        ys = graded_lines(0.0, H, c_y, lc_min, lc_max, r, 2 * H)
    else:
        xs = np.linspace(0.0, L, n + 1)
        ys = np.linspace(0.0, H, n + 1)
    nx, ny = len(xs) - 1, len(ys) - 1
    cx = 0.5 * (xs[:-1] + xs[1:])[None, :]
    cy = 0.5 * (ys[:-1] + ys[1:])[:, None]
    active = np.ones((ny, nx), dtype=bool)
    hole = None
    if obstacle:
        # remove every square that intersects the disk (distance from the
        # disk center to the square < r); per-square half-widths handle
        # the graded case
        hwx = 0.5 * np.diff(xs)[None, :]
        hwy = 0.5 * np.diff(ys)[:, None]
        dx = np.maximum(np.abs(cx - c_x) - hwx, 0.0)
        dy = np.maximum(np.abs(cy - c_y) - hwy, 0.0)
        active &= (dx ** 2 + dy ** 2) >= r ** 2
        hole = (c_x, c_y, r)
    vertices, cells, s2c = _triangulate(active, xs, ys, diagonal)
    # exact L/n spacing on the uniform path: the closed-form locator
    # arithmetic (hx) is golden-parity-sensitive and linspace diffs can
    # differ from L/n in the last ulp; diff-max only for graded meshes
    spacing = ((float(np.diff(xs).max()), float(np.diff(ys).max()))
               if graded else (L / n, H / n))
    mesh = _finalize(vertices, cells, s2c, origin=(0.0, 0.0),
                     spacing=spacing,
                     grid_shape=(nx, ny),
                     diagonal=diagonal, domain="pipe",
                     extent=(0.0, 0.0, L, H), hole=hole,
                     xs=(xs if graded else None),
                     ys=(ys if graded else None))
    eps = 1e-12
    tags = np.full(mesh.bf_vertices.shape[0], -1, dtype=np.int64)
    tags = mark_boundary_facets(
        mesh, lambda x: (np.abs(x[:, 1]) < eps)
        | (np.abs(x[:, 1] - H) < eps), tag=PIPE_WALL_MARKER,
        base_tags=tags)
    tags = mark_boundary_facets(
        mesh, lambda x: (np.abs(x[:, 0]) < eps)
        | (np.abs(x[:, 0] - L) < eps), tag=PIPE_INLET_MARKER,
        base_tags=tags)
    if obstacle:
        # facets not on the outer rectangle belong to the obstacle
        mids = mesh.facet_midpoints()
        interior = ((mids[:, 0] > eps) & (mids[:, 0] < L - eps)
                    & (mids[:, 1] > eps) & (mids[:, 1] < H - eps))
        tags[interior] = PIPE_OBSTACLE_MARKER
    return mesh, tags


def mark_boundary_facets(mesh: Mesh2D,
                         predicate: Callable[[np.ndarray], np.ndarray],
                         tag: int = 1,
                         base_tags: Optional[np.ndarray] = None) -> np.ndarray:
    """Tag boundary facets, mirroring ``SubDomain.mark`` semantics
    (reference ``OCP_dolfin.py:118-128``): a facet receives ``tag`` iff the
    predicate holds at BOTH endpoints AND the midpoint (dolfin's
    ``check_midpoint=True`` default). Unmarked facets keep ``base_tags``
    (default 0, matching ``boundary_function.set_all(0)``).

    ``predicate`` maps an (n, 2) coordinate array to an (n,) bool array.
    """
    a = mesh.vertices[mesh.bf_vertices[:, 0]]
    b = mesh.vertices[mesh.bf_vertices[:, 1]]
    mid = 0.5 * (a + b)
    marked = predicate(a) & predicate(b) & predicate(mid)
    tags = (np.zeros(len(marked), dtype=np.int64)
            if base_tags is None else base_tags.copy())
    tags[marked] = tag
    return tags
