"""Batched assembly: gather → dense element compute → scatter-add.

The TPU-native replacement for dolfin's ``assemble(form)`` and the sparse
PETSc matrices behind ``solve`` (reference ``OCP_dolfin.py:325,350-351``):

* residual vectors are vmapped element kernels scatter-added into a global
  vector (`jnp.ndarray.at[].add` → XLA scatter),
* element matrices come from ``jax.jacfwd`` of the element residuals
  (15 forward tangents per cell — consistent with the residual by
  construction, replacing FFC-generated Jacobian code),
* the global operator is kept in two complementary forms:
    - a dense float32 matrix (for the MXU-friendly LU factorization),
    - the float64 element matrices themselves, giving an exact
      matrix-free ``matvec64`` used for iterative refinement — this avoids
      both storing a dense float64 matrix and TPU-emulated fp64 GEMMs.

Dirichlet BCs follow dolfin's ``bc.apply(A); bc.apply(b)``: constrained rows
are replaced by identity rows and RHS entries by the BC value
(``OCP_dolfin.py:368-369``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .spaces import TaylorHoodSpace, BoundaryQuad
from . import forms


# Cell-chunked element kernels: above this many cells the vmapped
# per-cell kernel runs as a lax.map over fixed-size blocks. The all-cells
# vmap materializes per-quad jacfwd intermediates like
# (nq, ncell, 12, 15, 2, 2) whose tiny trailing dims the TPU tiles pad
# 11–14×: at Nx=192 (73728 cells) the Newton-body assembly alone held
# 15.75 GB of padded HLO temps — the round-3 hires OOM. Chunking bounds
# the live intermediate to the block; per-cell math (and therefore every
# assembled value) is bit-identical. Threshold leaves every measured
# Nx≤96 program untouched.
CELL_CHUNK = 4096
CELL_CHUNK_THRESHOLD = 32768


def map_cells(fn, *args):
    """``jax.vmap(fn)(*args)``, blocked over axis 0 when it is large."""
    n = args[0].shape[0]
    if n <= CELL_CHUNK_THRESHOLD:
        return jax.vmap(fn)(*args)
    npad = (-n) % CELL_CHUNK
    nblk = (n + npad) // CELL_CHUNK

    def blocks(x):
        if npad:
            x = jnp.concatenate(
                [x, jnp.zeros((npad,) + x.shape[1:], x.dtype)])
        return x.reshape((nblk, CELL_CHUNK) + x.shape[1:])

    out = jax.lax.map(lambda xs: jax.vmap(fn)(*xs),
                      tuple(blocks(a) for a in args))
    return jax.tree_util.tree_map(
        lambda o: o.reshape((nblk * CELL_CHUNK,) + o.shape[2:])[:n], out)


# ---------------------------------------------------------------------------
# scatter helpers
# ---------------------------------------------------------------------------

def scatter_vector(n: int, dofs: jnp.ndarray, vals: jnp.ndarray,
                   inc: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Σ-reduce local element vectors into a global vector.

    With ``inc`` (the transpose incidence of ``dofs``,
    ``fem.spaces._mixed_incidence``) the reduction is a GATHER + row-sum
    — a TPU scatter-add of 30k element contributions costs ~2 ms while
    the gather form is bandwidth-trivial. ``vals`` must then be laid out
    so that its flattened index is ``dofs``'s flattened index (true for
    (nc, k) element blocks). Summation order differs from the scatter
    form by reassociation only (XLA's scatter order is itself
    unspecified); callers relying on exact dof-level reproducibility
    pin one form."""
    if inc is not None:
        flat = jnp.concatenate(
            [vals.reshape(-1), jnp.zeros((1,), vals.dtype)])
        return flat[inc].sum(axis=0)
    return jnp.zeros(n, vals.dtype).at[dofs].add(vals)


def scatter_matrix_dense(n: int, rows: jnp.ndarray, cols: jnp.ndarray,
                         mats: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Σ-scatter (ne, k, k) element matrices into a dense (n, n) matrix."""
    a = jnp.zeros((n, n), dtype)
    return a.at[rows[:, :, None], cols[:, None, :]].add(mats.astype(dtype))


# ---------------------------------------------------------------------------
# Operator: dense fp32 view + exact fp64 matrix-free apply
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Operator:
    """A bilinear operator assembled from element matrices, with Dirichlet
    rows replaced by identity."""

    cell_mats: jnp.ndarray            # (nc, 15, 15) float64
    cell_dofs: jnp.ndarray            # (nc, 15)
    facet_mats: Optional[jnp.ndarray]  # (nf, 15, 15) float64 or None
    facet_dofs: Optional[jnp.ndarray]  # (nf, 15)
    bc_dofs: jnp.ndarray              # (m,)
    n: int
    # transpose incidence of cell_dofs (spaces.TaylorHoodSpace.inc_mixed):
    # when present, matvec64 reduces by gather instead of scatter-add
    inc: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return ((self.cell_mats, self.cell_dofs, self.facet_mats,
                 self.facet_dofs, self.bc_dofs, self.inc), (self.n,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:5], aux[0], children[5])

    def dense(self, dtype=jnp.float32) -> jnp.ndarray:
        a = scatter_matrix_dense(self.n, self.cell_dofs, self.cell_dofs,
                                 self.cell_mats, dtype)
        if self.facet_mats is not None:
            a = a.at[self.facet_dofs[:, :, None],
                     self.facet_dofs[:, None, :]].add(
                         self.facet_mats.astype(dtype))
        # identity rows on Dirichlet dofs
        a = a.at[self.bc_dofs, :].set(0.0)
        a = a.at[self.bc_dofs, self.bc_dofs].set(1.0)
        return a

    def matvec64(self, x: jnp.ndarray) -> jnp.ndarray:
        """Exact float64 A@x via element-level gather/einsum/reduce."""
        y = scatter_vector(
            self.n, self.cell_dofs,
            jnp.einsum("cab,cb->ca", self.cell_mats, x[self.cell_dofs]),
            inc=self.inc)
        if self.facet_mats is not None:
            y = y.at[self.facet_dofs].add(
                jnp.einsum("fab,fb->fa", self.facet_mats, x[self.facet_dofs]))
        return y.at[self.bc_dofs].set(x[self.bc_dofs])


def apply_bc_vector(r: jnp.ndarray, bc_dofs: jnp.ndarray,
                    bc_vals: jnp.ndarray) -> jnp.ndarray:
    """dolfin ``bc.apply(b)``: set constrained entries to the BC value."""
    return r.at[bc_dofs].set(bc_vals)


# ---------------------------------------------------------------------------
# Navier–Stokes residual / Jacobian
# ---------------------------------------------------------------------------

def ns_residual(space: TaylorHoodSpace, bq: Optional[BoundaryQuad],
                w: jnp.ndarray, f_quad: Optional[jnp.ndarray],
                nu: float, convection: bool = True,
                backflow: str = "none",
                boundary_stab: bool = True) -> jnp.ndarray:
    """Global NS residual (without BC application).

    f_quad: (nf, nq, 2) control values at Γ₁ quadrature points, or None.
    """
    wl = w[space.cell_dofs_mixed]
    cell_r = map_cells(
        lambda wl_, ji, dj: forms.ns_cell_residual(
            space, wl_, ji, dj, nu, convection),
        wl, space.cell_jinv, space.cell_detj)
    r = scatter_vector(space.ndof, space.cell_dofs_mixed, cell_r,
                       inc=space.inc_mixed)
    if bq is not None:
        fdofs = space.cell_dofs_mixed[bq.cells]
        wf = w[fdofs]
        bf = backflow if boundary_stab else "off"
        if f_quad is None:
            facet_r = jax.vmap(
                lambda wl_, ph, nrm, wt: forms.ns_facet_residual(
                    space, wl_, ph, nrm, wt, None, bf)
            )(wf, bq.phi2, bq.normals, bq.weights)
        else:
            facet_r = jax.vmap(
                lambda wl_, ph, nrm, wt, fq: forms.ns_facet_residual(
                    space, wl_, ph, nrm, wt, fq, bf)
            )(wf, bq.phi2, bq.normals, bq.weights, f_quad)
        r = r.at[fdofs].add(facet_r)
    return r


def ns_operator(space: TaylorHoodSpace, bq: Optional[BoundaryQuad],
                w: jnp.ndarray, nu: float, bc_dofs: jnp.ndarray,
                convection: bool = True, backflow: str = "none",
                boundary_stab: bool = True) -> Operator:
    """Jacobian of the NS residual at w (or the Stokes operator when
    convection=False — then it is w-independent)."""
    wl = w[space.cell_dofs_mixed]
    cell_jac = map_cells(
        jax.jacfwd(lambda wl_, ji, dj: forms.ns_cell_residual(
            space, wl_, ji, dj, nu, convection)),
        wl, space.cell_jinv, space.cell_detj)
    facet_mats = facet_dofs = None
    if bq is not None and boundary_stab:
        fdofs = space.cell_dofs_mixed[bq.cells]
        wf = w[fdofs]
        facet_mats = jax.vmap(
            jax.jacfwd(lambda wl_, ph, nrm, wt: forms.ns_facet_residual(
                space, wl_, ph, nrm, wt, None, backflow))
        )(wf, bq.phi2, bq.normals, bq.weights)
        facet_dofs = fdofs
    return Operator(cell_jac, space.cell_dofs_mixed, facet_mats, facet_dofs,
                    bc_dofs, space.ndof, inc=space.inc_mixed)


# ---------------------------------------------------------------------------
# Adjoint operator (reference OCP_dolfin.py:344-351)
# ---------------------------------------------------------------------------

def adjoint_operator(space: TaylorHoodSpace, bq: Optional[BoundaryQuad],
                     w: jnp.ndarray, bc_dofs: jnp.ndarray) -> Operator:
    wl = w[space.cell_dofs_mixed]
    cell_jac = map_cells(
        jax.jacfwd(lambda zl, wl_, ji, dj: forms.adjoint_cell_residual(
            space, zl, wl_, ji, dj)),
        wl * 0.0, wl, space.cell_jinv, space.cell_detj)
    facet_mats = facet_dofs = None
    if bq is not None:
        fdofs = space.cell_dofs_mixed[bq.cells]
        wf = w[fdofs]
        facet_mats = jax.vmap(
            jax.jacfwd(lambda zl, wl_, ph, nrm, wt:
                       forms.adjoint_facet_residual(zl, wl_, ph, nrm, wt))
        )(wf * 0.0, wf, bq.phi2, bq.normals, bq.weights)
        facet_dofs = fdofs
    return Operator(cell_jac, space.cell_dofs_mixed, facet_mats, facet_dofs,
                    bc_dofs, space.ndof, inc=space.inc_mixed)


# ---------------------------------------------------------------------------
# Boundary load vector  ∫ f·v ds(1)
# ---------------------------------------------------------------------------

def boundary_load(space: TaylorHoodSpace, bq: BoundaryQuad,
                  f_quad: jnp.ndarray) -> jnp.ndarray:
    """RHS vector of the Neumann control load (``OCP_dolfin.py:323``)."""
    vals = jnp.einsum("fq,fqi,fqa->fai", bq.weights, f_quad, bq.phi2)
    fdofs = space.cell_dofs_mixed[bq.cells]
    loc = jnp.concatenate(
        [vals.reshape(-1, 12),
         jnp.zeros((vals.shape[0], 3), vals.dtype)], axis=1)
    return scatter_vector(space.ndof, fdofs, loc)


# ---------------------------------------------------------------------------
# P1 mass matrix + grad(u) projection (OCP_dolfin.py:328-329)
# ---------------------------------------------------------------------------

def p1_mass_matrix(space: TaylorHoodSpace) -> jnp.ndarray:
    """Dense P1 scalar mass matrix (n_p1, n_p1) in float64."""
    mats = jax.vmap(lambda dj: forms.p1_mass_cell(space, dj))(space.cell_detj)
    a = jnp.zeros((space.n_p1, space.n_p1))
    return a.at[space.cell_dofs_p1[:, :, None],
                space.cell_dofs_p1[:, None, :]].add(mats)


def gradu_projection_rhs(space: TaylorHoodSpace, u: jnp.ndarray
                         ) -> jnp.ndarray:
    """RHS of the L2 projection of ∇u onto the P1 tensor space.
    u: (n_p2, 2) velocity dofs → (n_p1, 2, 2)."""
    ul = u[space.cell_dofs_p2]
    rhs = jax.vmap(
        lambda ul_, ji, dj: forms.gradu_projection_cell_rhs(space, ul_, ji, dj)
    )(ul, space.cell_jinv, space.cell_detj)
    out = jnp.zeros((space.n_p1, 2, 2))
    return out.at[space.cell_dofs_p1].add(rhs)


# ---------------------------------------------------------------------------
# Scalar functionals
# ---------------------------------------------------------------------------

def divergence_l2(space: TaylorHoodSpace, u: jnp.ndarray) -> jnp.ndarray:
    """sqrt(∫ div(u)² dx)  (reference ``OCP_dolfin.py:430``)."""
    ul = u[space.cell_dofs_p2]
    def per_cell(ul_, ji, dj):
        dphi = jnp.einsum("qad,di->qai", space.dphi2_ref, ji)
        gu = jnp.einsum("ai,qaj->qij", ul_, dphi)
        divu = gu[:, 0, 0] + gu[:, 1, 1]
        return jnp.sum(space.qw * dj * divu ** 2)
    return jnp.sqrt(jnp.sum(jax.vmap(per_cell)(
        ul, space.cell_jinv, space.cell_detj)))


def velocity_norms(space: TaylorHoodSpace, u: jnp.ndarray):
    """(L2, H1) norms: sqrt(∫|u|²) and sqrt(∫|u|² + |∇u|²)
    (reference ``ud_construction_pipeline.py:233-234``)."""
    ul = u[space.cell_dofs_p2]
    def per_cell(ul_, ji, dj):
        dphi = jnp.einsum("qad,di->qai", space.dphi2_ref, ji)
        u_q = jnp.einsum("qa,ai->qi", space.phi2, ul_)
        gu = jnp.einsum("ai,qaj->qij", ul_, dphi)
        l2 = jnp.sum(space.qw * dj * jnp.sum(u_q ** 2, axis=-1))
        h1 = jnp.sum(space.qw * dj * jnp.sum(gu ** 2, axis=(-2, -1)))
        return l2, h1
    l2s, h1s = jax.vmap(per_cell)(ul, space.cell_jinv, space.cell_detj)
    l2 = jnp.sum(l2s)
    return jnp.sqrt(l2), jnp.sqrt(l2 + jnp.sum(h1s))


def velocity_diff_norms(space: TaylorHoodSpace, u: jnp.ndarray,
                        u_ref: jnp.ndarray):
    """‖u − ū‖_{L²} and H¹ norms vs a stored reference flow
    (reference ``Pipeline_limits.py:432-443``)."""
    return velocity_norms(space, u - u_ref)


def l2_tracking_volume(space: TaylorHoodSpace, u: jnp.ndarray,
                       ud_const: jnp.ndarray) -> jnp.ndarray:
    """∫ 0.5 |u − u_d|² dx with constant u_d — the Stokes gradcheck cost
    part A (reference ``Stokes_gradient_check_dolfin.py:50-52``)."""
    ul = u[space.cell_dofs_p2]
    def per_cell(ul_, dj):
        u_q = jnp.einsum("qa,ai->qi", space.phi2, ul_)
        return jnp.sum(space.qw * dj
                       * 0.5 * jnp.sum((u_q - ud_const) ** 2, axis=-1))
    return jnp.sum(jax.vmap(per_cell)(ul, space.cell_detj))


def volume_tracking_rhs(space: TaylorHoodSpace, u: jnp.ndarray,
                        ud_const: jnp.ndarray) -> jnp.ndarray:
    """RHS vector ∫ (u − u_d)·v dx (adjoint load of the Stokes gradcheck,
    reference ``Stokes_gradient_check_dolfin.py:62``)."""
    ul = u[space.cell_dofs_p2]
    def per_cell(ul_, dj):
        u_q = jnp.einsum("qa,ai->qi", space.phi2, ul_)
        rv = jnp.einsum("q,qi,qa->ai", space.qw * dj, u_q - ud_const,
                        space.phi2)
        return jnp.concatenate([rv.reshape(12), jnp.zeros(3, rv.dtype)])
    vals = jax.vmap(per_cell)(ul, space.cell_detj)
    return scatter_vector(space.ndof, space.cell_dofs_mixed, vals,
                          inc=space.inc_mixed)
