"""Reader for legacy-dolfin XDMF/HDF5 checkpoints (the golden fields).

The reference ships converged dolfin velocity fields under
``reference_runs/*/paraview`` (written by ``XDMFFile.write_checkpoint``,
``OCP_dolfin.py:577-588``) and reloads one as the comparison flow ū
(``Pipeline_limits.py:432-435``). This module maps those checkpoints onto
our dof numbering so golden comparisons are exact.

Legacy dolfin checkpoint layout (velocity, P2 vector on triangles):
  * ``mesh/geometry`` (nv, 2), ``mesh/topology`` (nc, 3),
  * ``cell_dofs`` (nc*12, 1): per cell, component-blocked local dofs —
    x-components at (v0, v1, v2, e0, e1, e2) then y-components — where
    edge i is the edge opposite local vertex i (dolfin's UFC ordering,
    identical to ours),
  * ``vector``: the dof values indexed by ``cell_dofs``.
"""

from __future__ import annotations

import numpy as np

from ..mesh.structured import Mesh2D
from ..fem.spaces import TaylorHoodSpace


def read_checkpoint_velocity(path: str, mesh: Mesh2D,
                             space: TaylorHoodSpace,
                             name: str = "u") -> np.ndarray:
    """Read a dolfin velocity checkpoint and return (n_p2, 2) dof values in
    OUR numbering. The dolfin mesh must be geometrically identical to ours
    (vertex coordinates may be permuted; cells are matched by coordinates).
    """
    import h5py

    with h5py.File(path, "r") as fh:
        grp = fh[name][f"{name}_0"]
        geom = np.asarray(grp["mesh"]["geometry"])
        topo = np.asarray(grp["mesh"]["topology"])
        cell_dofs = np.asarray(grp["cell_dofs"]).reshape(-1)
        vec = np.asarray(grp["vector"]).reshape(-1)

    nc = topo.shape[0]
    assert cell_dofs.shape[0] == 12 * nc, "expected P2 vector checkpoint"
    cell_dofs = cell_dofs.reshape(nc, 12)

    # match dolfin vertices to ours by coordinates (round to kill fp noise)
    def key(arr):
        return np.round(arr * 1e10).astype(np.int64)

    if geom.shape[0] != mesh.num_vertices:
        raise ValueError(
            f"checkpoint mesh has {geom.shape[0]} vertices but ours has "
            f"{mesh.num_vertices} — resolutions must match")
    ours = {tuple(k): i for i, k in enumerate(key(mesh.vertices))}
    try:
        theirs_to_ours = np.array([ours[tuple(k)] for k in key(geom)],
                                  dtype=np.int64)
    except KeyError as e:
        raise ValueError("checkpoint mesh geometry does not match ours "
                         f"(vertex {e} not found)") from None

    # match dolfin cells to ours via sorted vertex triples
    our_cells_sorted = {tuple(sorted(c)): i for i, c in enumerate(
        mesh.cells.tolist())}

    u = np.zeros((space.n_p2, 2))
    cell_dofs_p2 = np.asarray(space.cell_dofs_p2)
    nv = mesh.num_vertices
    for c in range(nc):
        tri_ours_verts = theirs_to_ours[topo[c]]
        oc = our_cells_sorted[tuple(sorted(tri_ours_verts.tolist()))]
        # dolfin local vertex a ↔ our local vertex with same global id;
        # dolfin local edge i is opposite local vertex i (same as ours)
        our_verts = mesh.cells[oc]
        perm = np.array([np.nonzero(our_verts == gv)[0][0]
                         for gv in tri_ours_verts])   # dolfin local → ours
        for comp in range(2):
            for a in range(3):   # vertex dofs
                sd = cell_dofs_p2[oc, perm[a]]
                u[sd, comp] = vec[cell_dofs[c, comp * 6 + a]]
            for i in range(3):   # edge dofs: edge opposite vertex i
                sd = cell_dofs_p2[oc, 3 + perm[i]]
                u[sd, comp] = vec[cell_dofs[c, comp * 6 + 3 + i]]
    return u
