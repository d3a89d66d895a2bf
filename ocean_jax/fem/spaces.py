"""Taylor–Hood (P2/P1) mixed function space on a `Mesh2D`.

Replaces ``FunctionSpace(mesh, MixedElement([P2, P1]))`` and its C++ dofmap
(reference ``OCP_dolfin.py:106-113``) with explicit index tables:

  * P2 scalar dof ``s``: vertex dofs ``0..nv-1`` then edge-midpoint dofs
    ``nv..nv+ne-1``,
  * mixed global numbering: velocity component ``c`` of scalar dof ``s`` is
    ``2*s + c`` (interleaved, dolfin-style), pressure dof at vertex ``v`` is
    ``2*n_p2 + v``. Total ``N = 2*n_p2 + nv``.

The space owns all device-resident tables needed by assembly, interpolation
and boundary integrals; building it is a one-time host-side setup step
(the analog of dolfin's mesh/dofmap initialization).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.structured import Mesh2D, mark_boundary_facets
from ..mesh.locate import Locator
from . import reference as ref

VOLUME_QUAD_DEGREE = 6
EDGE_GAUSS_POINTS = 4      # exact to degree 7 on facets


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BoundaryQuad:
    """Quadrature data for a tagged set of boundary facets (the ``ds(1)``
    measure of the reference, ``OCP_dolfin.py:138-140``).

    Shapes: nf facets, nq quadrature points per facet.
    """

    facet_ids: jnp.ndarray     # (nf,) indices into mesh.bf_* arrays
    cells: jnp.ndarray         # (nf,) owning cell
    phi2: jnp.ndarray          # (nf, nq, 6) P2 basis at facet quad points
    normals: jnp.ndarray       # (nf, 2) outward unit normals
    weights: jnp.ndarray       # (nf, nq) quadrature weight × facet length
    points: jnp.ndarray        # (nf, nq, 2) physical quad-point coordinates

    def tree_flatten(self):
        return ((self.facet_ids, self.cells, self.phi2, self.normals,
                 self.weights, self.points), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_facets(self) -> int:
        return self.facet_ids.shape[0]

    @property
    def num_points(self) -> int:
        return self.phi2.shape[1]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TaylorHoodSpace:
    """All tables for P2/P1 mixed FEM on a structured triangle mesh."""

    # sizes (static)
    n_p2: int
    n_p1: int

    # dof maps
    cell_dofs_p2: jnp.ndarray      # (nc, 6) scalar P2 dofs
    cell_dofs_p1: jnp.ndarray      # (nc, 3) = cells
    cell_dofs_mixed: jnp.ndarray   # (nc, 15)

    # geometry
    cell_jinv: jnp.ndarray         # (nc, 2, 2)
    cell_detj: jnp.ndarray         # (nc,)

    # volume quadrature tables
    qw: jnp.ndarray                # (nq,) includes ref-area factor
    phi1: jnp.ndarray              # (nq, 3)
    phi2: jnp.ndarray              # (nq, 6)
    dphi2_ref: jnp.ndarray         # (nq, 6, 2)
    dphi1_ref: jnp.ndarray         # (3, 2)

    dof_coords_p2: jnp.ndarray     # (n_p2, 2)

    locator: Locator

    # transpose incidence of cell_dofs_mixed: (max_inc, ndof) int32
    # indices into the flattened (nc·15,) element-contribution array
    # (sentinel nc·15 → a zero pad slot). Assembly reductions become
    # GATHER + row-sum instead of scatter-add — a TPU scatter of the
    # 30720 element contributions costs ~2 ms while the equivalent
    # gather is microseconds (fused-profile trace, Nx=32).
    inc_mixed: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        children = (self.cell_dofs_p2, self.cell_dofs_p1, self.cell_dofs_mixed,
                    self.cell_jinv, self.cell_detj, self.qw, self.phi1,
                    self.phi2, self.dphi2_ref, self.dphi1_ref,
                    self.dof_coords_p2, self.locator, self.inc_mixed)
        return children, (self.n_p2, self.n_p1)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], *children)

    @property
    def ndof(self) -> int:
        """Total mixed dofs: 2 velocity components × n_p2 + n_p1 pressure."""
        return 2 * self.n_p2 + self.n_p1

    @property
    def num_cells(self) -> int:
        return self.cell_dofs_p2.shape[0]

    # --- helpers -------------------------------------------------------
    def split(self, w: jnp.ndarray):
        """Mixed vector → (velocity (n_p2, 2), pressure (n_p1,))."""
        return w[: 2 * self.n_p2].reshape(self.n_p2, 2), w[2 * self.n_p2:]

    def join(self, u: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([u.reshape(-1), p])


def _mixed_cell_dofs(cell_dofs_p2: np.ndarray, cells: np.ndarray,
                     n_p2: int) -> np.ndarray:
    nc = cell_dofs_p2.shape[0]
    vel = np.empty((nc, 12), dtype=np.int64)
    vel[:, 0::2] = 2 * cell_dofs_p2
    vel[:, 1::2] = 2 * cell_dofs_p2 + 1
    pres = 2 * n_p2 + cells
    return np.concatenate([vel, pres], axis=1)


def _mixed_incidence(cell_dofs_mixed: np.ndarray, ndof: int) -> np.ndarray:
    """Transpose incidence of the mixed dofmap (host-side, one-time).

    Returns (max_inc, ndof) int32: row j of column d is the j-th index
    into the FLATTENED (nc·15,) element-contribution array that
    accumulates into global dof d; unused rows hold the sentinel nc·15
    (callers append one zero slot). max_inc is 6 on the structured
    triangulations (vertex dofs touch ≤6 cells, edge dofs 2)."""
    flat = np.asarray(cell_dofs_mixed).reshape(-1).astype(np.int64)
    order = np.argsort(flat, kind="stable")
    counts = np.bincount(flat, minlength=ndof)
    starts = np.zeros(ndof + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(flat.size, dtype=np.int64) - starts[flat[order]]
    inc = np.full((int(counts.max()), ndof), flat.size, dtype=np.int32)
    inc[pos, flat[order]] = order
    return inc


def make_space(mesh: Mesh2D) -> TaylorHoodSpace:
    """Build the Taylor–Hood space tables for a mesh (one-time setup)."""
    nv, ne, nc = mesh.num_vertices, mesh.num_edges, mesh.num_cells
    n_p2 = nv + ne
    cell_dofs_p2 = np.concatenate(
        [mesh.cells, nv + mesh.cell_edges], axis=1)          # (nc, 6)
    cell_dofs_mixed = _mixed_cell_dofs(cell_dofs_p2, mesh.cells, n_p2)

    v = mesh.cell_vertices()
    jac = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]], axis=2)
    detj = np.abs(np.linalg.det(jac))
    jinv = np.linalg.inv(jac)

    qp, qw = ref.triangle_quadrature(VOLUME_QUAD_DEGREE)
    phi1 = ref.p1_basis(qp)
    phi2 = ref.p2_basis(qp)
    dphi2 = ref.p2_grad_ref(qp)

    midpoints = 0.5 * (mesh.vertices[mesh.edges[:, 0]]
                       + mesh.vertices[mesh.edges[:, 1]])
    dof_coords = np.concatenate([mesh.vertices, midpoints], axis=0)

    return TaylorHoodSpace(
        n_p2=n_p2,
        n_p1=nv,
        cell_dofs_p2=jnp.asarray(cell_dofs_p2, dtype=jnp.int32),
        cell_dofs_p1=jnp.asarray(mesh.cells, dtype=jnp.int32),
        cell_dofs_mixed=jnp.asarray(cell_dofs_mixed, dtype=jnp.int32),
        cell_jinv=jnp.asarray(jinv),
        cell_detj=jnp.asarray(detj),
        qw=jnp.asarray(qw),
        phi1=jnp.asarray(phi1),
        phi2=jnp.asarray(phi2),
        dphi2_ref=jnp.asarray(dphi2),
        dphi1_ref=jnp.asarray(ref.P1_GRAD),
        dof_coords_p2=jnp.asarray(dof_coords),
        locator=Locator.from_mesh(mesh),
        inc_mixed=jnp.asarray(
            _mixed_incidence(cell_dofs_mixed, 2 * n_p2 + nv)),
    )


def make_boundary_quad(mesh: Mesh2D, tags: np.ndarray, tag: int = 1,
                       n_gauss: int = EDGE_GAUSS_POINTS) -> BoundaryQuad:
    """Build facet quadrature tables for all boundary facets with ``tags ==
    tag`` — the discrete ``ds(tag)`` measure."""
    sel = np.nonzero(tags == tag)[0]
    cells = mesh.bf_cells[sel]
    local = mesh.bf_local[sel]
    a = mesh.vertices[mesh.bf_vertices[sel, 0]]     # (nf, 2)
    b = mesh.vertices[mesh.bf_vertices[sel, 1]]
    lengths = np.linalg.norm(b - a, axis=1)
    normals = mesh.bf_normals[sel]

    gp, gw = ref.gauss_legendre_01(n_gauss)
    # physical quad points along each facet
    pts = a[:, None, :] + gp[None, :, None] * (b - a)[:, None, :]
    # reference coordinates of those points inside the owning cell
    v = mesh.cell_vertices()[cells]                 # (nf, 3, 2)
    jac = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]], axis=2)
    jinv = np.linalg.inv(jac)
    d = pts - v[:, None, 0, :]
    xi = np.einsum("fij,fqj->fqi", jinv, d)
    phi2 = ref.p2_basis(xi)                         # (nf, nq, 6)

    weights = lengths[:, None] * gw[None, :]
    return BoundaryQuad(
        facet_ids=jnp.asarray(sel, dtype=jnp.int32),
        cells=jnp.asarray(cells, dtype=jnp.int32),
        phi2=jnp.asarray(phi2),
        normals=jnp.asarray(normals),
        weights=jnp.asarray(weights),
        points=jnp.asarray(pts),
    )


def dirichlet_velocity_bc(mesh: Mesh2D, space: TaylorHoodSpace,
                          predicate: Callable[[np.ndarray], np.ndarray],
                          value: Optional[Callable[[np.ndarray], np.ndarray]]
                          = None):
    """Dirichlet BC on the velocity subspace, topological method.

    Mirrors ``DirichletBC(W.sub(0), g, boundary)`` (reference
    ``OCP_dolfin.py:131-136``): a facet is constrained iff the predicate
    holds at both endpoints (and midpoint); constrained dofs are all P2 dofs
    on constrained facets (2 vertices + 1 edge midpoint, both components).

    Returns (mixed dof indices (m,), values (m,)).
    """
    tags = mark_boundary_facets(mesh, predicate, tag=1)
    sel = np.nonzero(tags == 1)[0]
    nv = mesh.num_vertices
    # edge id of each boundary facet: it is edge `bf_local` of `bf_cells`
    edge_ids = mesh.cell_edges[mesh.bf_cells[sel], mesh.bf_local[sel]]
    scalar_dofs = np.unique(np.concatenate(
        [mesh.bf_vertices[sel].reshape(-1), nv + edge_ids]))
    coords = np.asarray(space.dof_coords_p2)[scalar_dofs]
    if value is None:
        vals = np.zeros((scalar_dofs.shape[0], 2))
    else:
        vals = np.asarray(value(coords))
    mixed = np.concatenate([2 * scalar_dofs, 2 * scalar_dofs + 1])
    values = np.concatenate([vals[:, 0], vals[:, 1]])
    return (jnp.asarray(mixed, dtype=jnp.int32), jnp.asarray(values))


def dirichlet_pressure_bc(mesh: Mesh2D, space: TaylorHoodSpace,
                          predicate: Callable[[np.ndarray], np.ndarray],
                          value: float = 0.0):
    """Dirichlet BC on the pressure subspace (used by the u_d construction
    pipeline's pressure pin, reference ``ud_construction_pipeline.py:105``)."""
    tags = mark_boundary_facets(mesh, predicate, tag=1)
    sel = np.nonzero(tags == 1)[0]
    verts = np.unique(mesh.bf_vertices[sel].reshape(-1))
    mixed = 2 * space.n_p2 + verts
    return (jnp.asarray(mixed, dtype=jnp.int32),
            jnp.full(verts.shape[0], value))


def combine_bcs(*bcs):
    """Merge (dofs, values) pairs with later-BC-wins semantics on shared
    dofs (dolfin applies BCs in list order; the last ``apply`` overwrites,
    e.g. corner dofs shared by the no-slip and inflow BCs of the u_d
    construction pipeline)."""
    dofs = np.concatenate([np.asarray(b[0]) for b in bcs])
    vals = np.concatenate([np.asarray(b[1]) for b in bcs])
    # keep the LAST occurrence of each dof
    rev_dofs = dofs[::-1]
    uniq, first_idx = np.unique(rev_dofs, return_index=True)
    return (jnp.asarray(uniq, dtype=jnp.int32),
            jnp.asarray(vals[::-1][first_idx]))
