"""Table-free FE point evaluation on the structured P2 half-grid.

On a structured triangulation every scalar P2 dof sits on a node of the
``(2·nx+1) × (2·ny+1)`` *half-grid* (vertices at even/even coordinates,
edge midpoints elsewhere), and every P1 dof on the ``(nx+1) × (ny+1)``
vertex grid. Point evaluation therefore needs **no index tables at all**:
the owning grid square and the local coordinates ``(s, t)`` follow from
pure arithmetic, and the six active P2 basis functions are a closed-form
3×3 *patch-weight* stencil on the half-grid (three of the nine patch
nodes get weight zero, depending on which triangle of the square owns the
point).

This replaces the gather chain of ``mesh/locate.py`` +
``fem/interpolate.py`` (``square_to_cell``/``cell_v0``/``cell_jinv``/
``cell_dofs_p2`` lookups per evaluation) with one 9-node value gather —
the layout the fused Pallas ODE kernel (``ode/pallas_ode.py``) needs,
where even that gather becomes an exact one-hot MXU row-selection.

Semantics match ``fem/interpolate.py`` exactly: out-of-domain lanes get
clamped-evaluation values and must be masked with the returned ``inside``
predicate (the reference's try/except escape detection,
``OCP_dolfin.py:209-221``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.spaces import TaylorHoodSpace
from ..mesh.locate import Locator, in_domain


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GridEval:
    """Half-grid dof layout for a `TaylorHoodSpace` on a structured mesh."""

    dof_to_node: jnp.ndarray   # (n_p2,) int32 flat half-grid node index
    vtx_to_node: jnp.ndarray   # (n_p1,) int32 flat vertex-grid node index
    locator: Locator           # domain predicates + origin/spacing metadata
    hg_shape: Tuple[int, int]  # (Hy, Hx) = (2·ny+1, 2·nx+1) half-grid nodes
    vg_shape: Tuple[int, int]  # (ny+1, nx+1) vertex-grid nodes

    def tree_flatten(self):
        return ((self.dof_to_node, self.vtx_to_node, self.locator),
                (self.hg_shape, self.vg_shape))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _nearest_line_index(lines: np.ndarray, vals: np.ndarray,
                        what: str) -> np.ndarray:
    """Index of the grid line each value sits on (graded tensor grids:
    lines are non-uniform, so indices come from a nearest-line search
    instead of the closed-form division)."""
    idx = np.clip(np.searchsorted(lines, vals), 1, len(lines) - 1)
    left_closer = (vals - lines[idx - 1]) < (lines[idx] - vals)
    idx = np.where(left_closer, idx - 1, idx)
    tol = 1e-9 * max(1.0, float(np.abs(lines).max()))
    if not np.all(np.abs(lines[idx] - vals) <= tol):
        raise ValueError(f"{what} do not lie on the structured half-grid")
    return idx.astype(np.int64)


def make_grideval(space: TaylorHoodSpace) -> GridEval:
    """Build the dof→half-grid map (host-side, one-time setup).

    Works for every structured domain (square, L-shape, pipe — uniform or
    locally graded): the grid covers the bounding box; nodes with no dof
    simply stay zero in the scattered image and are never read by an
    unmasked evaluation. On graded tensor grids (``graded_lines``) the
    half-grid node positions interleave the vertex lines with the interval
    midpoints — exactly where the P2 edge-midpoint dofs sit — and point
    location runs per-axis searchsorted instead of the closed form.
    """
    loc = space.locator
    nx, ny = loc.grid_shape
    x0, y0 = loc.origin
    hx, hy = loc.spacing
    coords = np.asarray(space.dof_coords_p2)
    Hx, Hy = 2 * nx + 1, 2 * ny + 1

    if loc.uniform:
        gx = np.rint((coords[:, 0] - x0) / (0.5 * hx)).astype(np.int64)
        gy = np.rint((coords[:, 1] - y0) / (0.5 * hy)).astype(np.int64)
        if (gx.min() < 0 or gx.max() >= Hx or gy.min() < 0
                or gy.max() >= Hy
                or not np.allclose(coords[:, 0], x0 + gx * 0.5 * hx)
                or not np.allclose(coords[:, 1], y0 + gy * 0.5 * hy)):
            raise ValueError(
                "P2 dofs do not lie on the structured half-grid")
    else:
        xs = np.asarray(loc.xs_lines)
        ys = np.asarray(loc.ys_lines)
        xs_half = np.empty(Hx)
        xs_half[0::2] = xs
        xs_half[1::2] = 0.5 * (xs[:-1] + xs[1:])
        ys_half = np.empty(Hy)
        ys_half[0::2] = ys
        ys_half[1::2] = 0.5 * (ys[:-1] + ys[1:])
        gx = _nearest_line_index(xs_half, coords[:, 0], "P2 dofs")
        gy = _nearest_line_index(ys_half, coords[:, 1], "P2 dofs")
    node = gy * Hx + gx
    if len(np.unique(node)) != len(node):
        raise ValueError("duplicate half-grid nodes in dof map")

    n_p1 = space.n_p1
    if loc.uniform:
        vx = np.rint((coords[:n_p1, 0] - x0) / hx).astype(np.int64)
        vy = np.rint((coords[:n_p1, 1] - y0) / hy).astype(np.int64)
    else:
        vx = _nearest_line_index(np.asarray(loc.xs_lines),
                                 coords[:n_p1, 0], "P1 dofs")
        vy = _nearest_line_index(np.asarray(loc.ys_lines),
                                 coords[:n_p1, 1], "P1 dofs")
    vnode = vy * (nx + 1) + vx

    return GridEval(
        dof_to_node=jnp.asarray(node, dtype=jnp.int32),
        vtx_to_node=jnp.asarray(vnode, dtype=jnp.int32),
        locator=loc,
        hg_shape=(Hy, Hx),
        vg_shape=(ny + 1, nx + 1),
    )


def velocity_to_grid(ge: GridEval, u: jnp.ndarray) -> jnp.ndarray:
    """Scatter P2 velocity dofs (n_p2, 2) into the half-grid image
    (Hy·Hx, 2). One cheap scatter per solved field (u is fixed across all
    ODE time steps)."""
    Hy, Hx = ge.hg_shape
    return jnp.zeros((Hy * Hx, 2), u.dtype).at[ge.dof_to_node].set(u)


def grad_to_grid(ge: GridEval, g: jnp.ndarray) -> jnp.ndarray:
    """Scatter the projected P1 gradient (n_p1, 2, 2) onto the vertex grid
    ((ny+1)·(nx+1), 2, 2)."""
    Gy, Gx = ge.vg_shape
    return jnp.zeros((Gy * Gx, 2, 2), g.dtype).at[ge.vtx_to_node].set(g)


def _square_coords(loc: Locator, points: jnp.ndarray):
    """Owning grid square (ix, iy) and local coords (s, t) ∈ [0,1]² for
    (clamped) points — mirrors ``locate_points``: closed-form arithmetic
    on uniform grids, per-axis searchsorted on graded tensor grids
    (``mesh.locate._square_index``)."""
    from ..mesh.locate import _square_index
    hx, hy = loc.spacing
    xmin, ymin, xmax, ymax = loc.extent
    px = jnp.clip(points[..., 0], xmin, xmax)
    py = jnp.clip(points[..., 1], ymin, ymax)
    if loc.domain == "lshape":
        cx, cy = loc.lshape_corner
        in_block = (px < cx) & (py > cy)
        py = jnp.where(in_block, cy - 0.5 * hy, py)
    return _square_index(loc, px, py)


def p2_patch_weights(s: jnp.ndarray, t: jnp.ndarray,
                     diagonal: str) -> jnp.ndarray:
    """Closed-form P2 basis values on the 3×3 half-grid patch of the
    owning square: W[..., b, a] multiplies node (2·iy+b, 2·ix+a).

    Derivation ("right" diagonal, dolfin default — the diagonal runs
    v(0,0)→v(1,1)): the lower triangle (t ≤ s) has barycentrics
    λ = (1−s, s−t, t) on vertices (0,0),(1,0),(1,1); the upper triangle
    λ = (1−t, s, t−s) on (0,0),(1,1),(0,1). Vertex dofs get λ(2λ−1),
    edge-midpoint dofs 4λᵢλⱼ; the three patch nodes outside the triangle
    get 0.
    """
    z = jnp.zeros_like(s)

    def vert(l):
        return l * (2.0 * l - 1.0)

    if diagonal == "right":
        # lower triangle t <= s: vertices (0,0),(2,0),(2,2) [patch (a,b)]
        lA, lB, lC = 1.0 - s, s - t, t
        Wl = jnp.stack([
            jnp.stack([vert(lA), 4 * lA * lB, vert(lB)], axis=-1),   # b=0
            jnp.stack([z, 4 * lA * lC, 4 * lB * lC], axis=-1),       # b=1
            jnp.stack([z, z, vert(lC)], axis=-1),                    # b=2
        ], axis=-2)
        # upper triangle t > s: vertices (0,0),(2,2),(0,2)
        lA, lC, lD = 1.0 - t, s, t - s
        Wu = jnp.stack([
            jnp.stack([vert(lA), z, z], axis=-1),
            jnp.stack([4 * lA * lD, 4 * lA * lC, z], axis=-1),
            jnp.stack([vert(lD), 4 * lC * lD, vert(lC)], axis=-1),
        ], axis=-2)
        upper = (t > s)[..., None, None]
    elif diagonal == "left":
        # diagonal v(1,0) -- v(0,1)
        lA, lB, lD = 1.0 - s - t, s, t     # lower: (0,0),(2,0),(0,2)
        Wl = jnp.stack([
            jnp.stack([vert(lA), 4 * lA * lB, vert(lB)], axis=-1),
            jnp.stack([4 * lA * lD, 4 * lB * lD, z], axis=-1),
            jnp.stack([vert(lD), z, z], axis=-1),
        ], axis=-2)
        lB, lC, lD = 1.0 - t, s + t - 1.0, 1.0 - s   # upper: (2,0),(2,2),(0,2)
        Wu = jnp.stack([
            jnp.stack([z, z, vert(lB)], axis=-1),
            jnp.stack([z, 4 * lB * lD, 4 * lB * lC], axis=-1),
            jnp.stack([vert(lD), 4 * lC * lD, vert(lC)], axis=-1),
        ], axis=-2)
        upper = (s + t > 1.0)[..., None, None]
    else:                                  # pragma: no cover
        raise ValueError(f"unsupported diagonal {diagonal!r}")
    return jnp.where(upper, Wu, Wl)


def p1_patch_weights(s: jnp.ndarray, t: jnp.ndarray,
                     diagonal: str) -> jnp.ndarray:
    """P1 basis values on the 2×2 vertex patch: W[..., b, a]."""
    z = jnp.zeros_like(s)
    if diagonal == "right":
        Wl = jnp.stack([jnp.stack([1.0 - s, s - t], axis=-1),
                        jnp.stack([z, t], axis=-1)], axis=-2)
        Wu = jnp.stack([jnp.stack([1.0 - t, z], axis=-1),
                        jnp.stack([t - s, s], axis=-1)], axis=-2)
        upper = (t > s)[..., None, None]
    elif diagonal == "left":
        Wl = jnp.stack([jnp.stack([1.0 - s - t, s], axis=-1),
                        jnp.stack([t, z], axis=-1)], axis=-2)
        Wu = jnp.stack([jnp.stack([z, 1.0 - t], axis=-1),
                        jnp.stack([1.0 - s, s + t - 1.0], axis=-1)],
                       axis=-2)
        upper = (s + t > 1.0)[..., None, None]
    else:                                  # pragma: no cover
        raise ValueError(f"unsupported diagonal {diagonal!r}")
    return jnp.where(upper, Wu, Wl)


def eval_velocity_grid(ge: GridEval, u_grid: jnp.ndarray,
                       points: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """P2 velocity evaluation from the half-grid image.

    u_grid: (Hy·Hx, 2) from :func:`velocity_to_grid`; points (..., 2).
    Returns (values (..., 2), inside (...,)) — drop-in equal (to rounding)
    to ``fem.interpolate.eval_velocity``.
    """
    loc = ge.locator
    inside = in_domain(loc, points)
    ix, iy, s, t = _square_coords(loc, points)
    W = p2_patch_weights(s, t, loc.diagonal)             # (..., 3, 3)
    Hy, Hx = ge.hg_shape
    base = (2 * iy) * Hx + 2 * ix                        # (...,)
    offs = (jnp.arange(3)[:, None] * Hx
            + jnp.arange(3)[None, :]).astype(jnp.int32)  # (3, 3)
    vals9 = u_grid[base[..., None, None] + offs]         # (..., 3, 3, 2)
    return jnp.einsum("...ba,...bai->...i", W, vals9), inside


def eval_p1_tensor_grid(ge: GridEval, g_grid: jnp.ndarray,
                        points: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """P1 tensor (projected ∇u) evaluation from the vertex-grid image.

    g_grid: ((ny+1)·(nx+1), 2, 2) from :func:`grad_to_grid`."""
    loc = ge.locator
    inside = in_domain(loc, points)
    ix, iy, s, t = _square_coords(loc, points)
    W = p1_patch_weights(s, t, loc.diagonal)             # (..., 2, 2)
    Gy, Gx = ge.vg_shape
    base = iy * Gx + ix
    offs = (jnp.arange(2)[:, None] * Gx
            + jnp.arange(2)[None, :]).astype(jnp.int32)
    vals4 = g_grid[base[..., None, None] + offs]         # (..., 2, 2, 2, 2)
    return jnp.einsum("...ba,...baij->...ij", W, vals4), inside
