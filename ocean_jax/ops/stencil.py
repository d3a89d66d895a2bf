"""Offset-stencil operator application for structured grids.

The TPU-first replacement for sparse CSR ``MatMult`` inside the Krylov
path (PETSc's role at reference ``OCP_dolfin.py:325,371``), exploiting
what PETSc cannot: on our structured triangulations every P2/P1 dof sits
on a half-grid node, so the assembled operator is a *position-dependent
stencil* — a matrix entry couples dofs whose half-grid nodes differ by
one of ≤25 fixed offsets ∈ [-2,2]².

The operator is therefore stored as a coefficient image

    S[o, c, c', node]   (offset o, row channel c, column channel c')

and applied as 25 static shifted-window multiply-adds over dense images:

    y[c, n] = Σ_o Σ_c' S[o, c, c', n] · x[c', n + off_o]

No gather/scatter in the hot loop: one (C·H) image gather in, static
slices of a padded image, one (ndof) gather out. The element scatter
matvec (``solve/mg.py::op_matvec``) measures ~4.5 ms at Nx=64 on TPU
v5e and is applied O(100)× per FGMRES solve; this form reads ~7–15 MB
of coefficients per application (~tens of µs at HBM bandwidth).

Coefficients are (re)built from the per-state element matrices in-program
by ONE sorted ``segment_sum`` per operator (per Newton iterate) using
host-precomputed permutation tables — amortized over every matvec of the
enclosing solve.

Channels: mixed operators use C=3 (u_x, u_y, p — pressure dofs live on
the even-even vertex nodes); velocity blocks use C=2. Dirichlet rows are
identity, exactly as ``op_matvec``. Works on every structured domain
(square, L-shape staircase, pipe, graded tensor grids): nodes without a
dof are dead image lanes that are written but never read back.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.spaces import TaylorHoodSpace, BoundaryQuad
from ..fem.assemble import Operator


def _halfgrid_indices(space: TaylorHoodSpace):
    """(gx, gy) half-grid index of every scalar P2 dof + grid dims
    (same node map as ``ode/grideval.py::make_grideval``)."""
    loc = space.locator
    nx, ny = loc.grid_shape
    Hx, Hy = 2 * nx + 1, 2 * ny + 1
    coords = np.asarray(space.dof_coords_p2)
    if loc.uniform:
        x0, y0 = loc.origin
        hx, hy = loc.spacing
        gx = np.rint((coords[:, 0] - x0) / (0.5 * hx)).astype(np.int64)
        gy = np.rint((coords[:, 1] - y0) / (0.5 * hy)).astype(np.int64)
    else:
        xs = np.asarray(loc.xs_lines)
        ys = np.asarray(loc.ys_lines)
        xs_half = np.empty(2 * nx + 1)
        xs_half[0::2] = xs
        xs_half[1::2] = 0.5 * (xs[:-1] + xs[1:])
        ys_half = np.empty(2 * ny + 1)
        ys_half[0::2] = ys
        ys_half[1::2] = 0.5 * (ys[:-1] + ys[1:])
        gx = np.clip(np.searchsorted(xs_half, coords[:, 0]), 1, Hx - 1)
        gx = np.where(coords[:, 0] - xs_half[gx - 1]
                      < xs_half[gx] - coords[:, 0], gx - 1, gx)
        gy = np.clip(np.searchsorted(ys_half, coords[:, 1]), 1, Hy - 1)
        gy = np.where(coords[:, 1] - ys_half[gy - 1]
                      < ys_half[gy] - coords[:, 1], gy - 1, gy)
    assert gx.min() >= 0 and gx.max() < Hx
    assert gy.min() >= 0 and gy.max() < Hy
    return gx, gy, Hx, Hy


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StencilTables:
    """Host-precomputed index tables turning one (cell_dofs, facet_dofs)
    topology into stencil form. Static for a given space/boundary pair."""

    perm: jnp.ndarray        # (E,) int32 — sort order over concat(cell,
                             #   facet) flattened element-matrix entries
    seg: jnp.ndarray         # (E,) int32 — sorted target slot in S_flat
    img_map: jnp.ndarray     # (C*H,) int32 — dof feeding each image lane
                             #   (ndof = dead lane → reads appended 0)
    out_map: jnp.ndarray     # (ndof,) int32 — image lane of each dof
    # static
    n_off: int               # number of distinct offsets (≤ 25)
    offsets: tuple           # ((dy, dx), ...) length n_off
    C: int                   # channels (3 mixed / 2 velocity)
    Hy: int
    Hx: int
    ndof: int
    n_cell_vals: int         # cell_mats.size (facet entries follow)

    def tree_flatten(self):
        return ((self.perm, self.seg, self.img_map, self.out_map),
                (self.n_off, self.offsets, self.C, self.Hy, self.Hx,
                 self.ndof, self.n_cell_vals))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def s_size(self) -> int:
        return self.n_off * self.C * self.C * self.Hy * self.Hx


def build_stencil_tables(space: TaylorHoodSpace,
                         bq: Optional[BoundaryQuad],
                         block: str = "mixed") -> StencilTables:
    """Build the tables for the mixed operator (``block="mixed"``) or its
    velocity sub-block (``block="vel"``, the mg smoother's operand —
    ``solve/mg.py::velocity_block``)."""
    gx, gy, Hx, Hy = _halfgrid_indices(space)
    H = Hy * Hx
    n_p2, n_p1 = space.n_p2, space.n_p1
    node_p2 = gy * Hx + gx                                  # (n_p2,)

    if block == "mixed":
        C, ndof = 3, space.ndof
        dof_node = np.concatenate([np.repeat(node_p2, 2), node_p2[:n_p1]])
        dof_chan = np.concatenate([np.tile([0, 1], n_p2),
                                   np.full(n_p1, 2)])
        cd = np.asarray(space.cell_dofs_mixed)              # (nc, 15)
    elif block == "vel":
        C, ndof = 2, 2 * n_p2
        dof_node = np.repeat(node_p2, 2)
        dof_chan = np.tile([0, 1], n_p2)
        cd = np.asarray(space.cell_dofs_mixed)[:, :12]
    else:
        raise ValueError(block)

    entry_dofs = [cd]
    if bq is not None:
        entry_dofs.append(cd[np.asarray(bq.cells)])         # facet layout
    n_cell_vals = cd.shape[0] * cd.shape[1] ** 2

    targets = []
    off_index = np.full((5, 5), -1, dtype=np.int64)
    offsets = []
    for dofs in entry_dofs:
        rows = dofs[:, :, None]
        cols = dofs[:, None, :]
        dyv = (dof_node[cols] // Hx) - (dof_node[rows] // Hx)
        dxv = (dof_node[cols] % Hx) - (dof_node[rows] % Hx)
        assert np.abs(dyv).max() <= 2 and np.abs(dxv).max() <= 2, \
            "operator couples dofs beyond the 5×5 stencil"
        for oy, ox in {(int(a), int(b))
                       for a, b in zip(dyv.ravel(), dxv.ravel())}:
            if off_index[oy + 2, ox + 2] < 0:
                off_index[oy + 2, ox + 2] = len(offsets)
                offsets.append((oy, ox))
        oid = off_index[dyv + 2, dxv + 2]
        t = (((oid * C + dof_chan[rows]) * C + dof_chan[cols]) * H
             + dof_node[rows])
        targets.append(t.ravel())
    targets = np.concatenate(targets)
    order = np.argsort(targets, kind="stable").astype(np.int64)
    seg = targets[order]
    s_size = len(offsets) * C * C * H
    assert seg[-1] < s_size and s_size < 2**31

    img_map = np.full(C * H, ndof, dtype=np.int64)          # dead → ndof
    img_map[dof_chan * H + dof_node] = np.arange(ndof)
    out_map = dof_chan * H + dof_node

    itype = jnp.int32 if max(len(order), s_size, C * H) < 2**31 else jnp.int64
    return StencilTables(
        perm=jnp.asarray(order, itype), seg=jnp.asarray(seg, itype),
        img_map=jnp.asarray(img_map, itype),
        out_map=jnp.asarray(out_map, itype),
        n_off=len(offsets), offsets=tuple(offsets), C=C, Hy=Hy, Hx=Hx,
        ndof=ndof, n_cell_vals=n_cell_vals)


def build_coefficients(st: StencilTables, op: Operator,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Element matrices → stencil coefficient image, one sorted
    segment_sum (in-program; per operator state)."""
    vals = op.cell_mats.reshape(-1)
    if op.facet_mats is not None:
        vals = jnp.concatenate([vals, op.facet_mats.reshape(-1)])
    assert vals.shape[0] == st.perm.shape[0], (
        "operator facet layout does not match the stencil tables")
    vals = vals[st.perm].astype(dtype)
    s = jax.ops.segment_sum(vals, st.seg, num_segments=st.s_size,
                            indices_are_sorted=True)
    return s.reshape(st.n_off, st.C, st.C, st.Hy, st.Hx)


def stencil_matvec(st: StencilTables, s: jnp.ndarray, bc_dofs: jnp.ndarray,
                   x: jnp.ndarray) -> jnp.ndarray:
    """y = A x with identity Dirichlet rows (semantics of
    ``solve/mg.py::op_matvec`` / ``Operator.matvec64``)."""
    dtype = s.dtype
    xe = jnp.concatenate([x.astype(dtype), jnp.zeros(1, dtype)])
    xi = xe[st.img_map].reshape(st.C, st.Hy, st.Hx)
    xp = jnp.pad(xi, ((0, 0), (2, 2), (2, 2)))
    y = jnp.zeros((st.C, st.Hy, st.Hx), dtype)
    for o, (dy, dx) in enumerate(st.offsets):
        win = jax.lax.slice(
            xp, (0, 2 + dy, 2 + dx),
            (st.C, 2 + dy + st.Hy, 2 + dx + st.Hx))
        y = y + jnp.einsum("cdyx,dyx->cyx", s[o], win)
    yv = y.reshape(-1)[st.out_map]
    return yv.at[bc_dofs].set(x[bc_dofs].astype(dtype))


def matvec_of(st: StencilTables, dtype=jnp.float32):
    """(op → mv) factory matching the ``matvec_of`` hooks of
    ``solve/mg.py``: builds the coefficient image once per operator, every
    returned application is stencil-form."""
    def of(op: Operator):
        s = build_coefficients(st, op, dtype)
        bc = op.bc_dofs

        def mv(x):
            return stencil_matvec(st, s, bc, x)
        return mv
    return of
