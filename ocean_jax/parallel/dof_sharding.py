"""Cell-sharded operator application for high-resolution solves.

SURVEY §2.3 item 2: at reference sizes the FE dofs are replicated; for the
"max mesh resolution" north-star runs the operator work is sharded. Since
the `Operator` is matrix-free (element matrices + dofmaps), the natural
decomposition shards the CELL axis across devices: each device applies its
element blocks to the (replicated) input vector and the partial global
vectors are ``psum``-reduced over ICI — exactly the role of PETSc's
distributed matvec + ghost updates in the abandoned MPI generation
(SURVEY §5.8).

Combined with ``solve.krylov.fgmres`` this gives multi-chip Krylov solves
without ever materializing a (sharded) sparse matrix.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fem.assemble import Operator


def _pad_axis(a: jnp.ndarray, n_dev: int) -> jnp.ndarray:
    n = a.shape[0]
    pad = (-n) % n_dev
    if pad == 0:
        return a
    z = jnp.zeros((pad,) + a.shape[1:], a.dtype)
    return jnp.concatenate([a, z])


def make_sharded_matvec(op: Operator, mesh: Mesh
                        ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return the float64 action of ``op`` sharded over the mesh's first
    axis. Padding cells carry zero matrices (dof 0 is touched with zero
    contributions — harmless)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    cell_mats = _pad_axis(op.cell_mats, n_dev)
    cell_dofs = _pad_axis(op.cell_dofs, n_dev)
    has_facets = op.facet_mats is not None
    if has_facets:
        facet_mats = _pad_axis(op.facet_mats, n_dev)
        facet_dofs = _pad_axis(op.facet_dofs, n_dev)

    def shard_fn(cm, cd, x, *facet):
        # compute at the precision of the input vector: float64 for exact
        # refinement residuals, native float32 for the Krylov fast path
        y = jnp.zeros(op.n, x.dtype).at[cd].add(
            jnp.einsum("cab,cb->ca", cm.astype(x.dtype), x[cd]))
        if facet:
            fm, fd = facet
            y = y.at[fd].add(
                jnp.einsum("fab,fb->fa", fm.astype(x.dtype), x[fd]))
        return jax.lax.psum(y, axis)

    if has_facets:
        sharded = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(axis), P(axis)),
            out_specs=P())
        def matvec(x):
            y = sharded(cell_mats, cell_dofs, x, facet_mats, facet_dofs)
            return y.at[op.bc_dofs].set(x[op.bc_dofs])
    else:
        sharded = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P()), out_specs=P())
        def matvec(x):
            y = sharded(cell_mats, cell_dofs, x)
            return y.at[op.bc_dofs].set(x[op.bc_dofs])
    return matvec
