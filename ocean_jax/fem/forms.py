"""Element-local weak forms of the coupled OCP system.

Hand-derived element kernels for the four forms the reference assembles via
UFL/FFC (SURVEY §2.2 "UFL/FFC form compiler"):

  * primal stationary Navier–Stokes residual with the Γ₁ outflow
    stabilization term and Neumann control load
    (reference ``OCP_dolfin.py:321-323``):
        a = (ν ∇u:∇v + (∇u·u)·v + div(u) q + div(v) p) dx
            − 0.5 (u·n)(u·v) ds(1) − f·v ds(1)
  * the Stokes subset (no convection, no boundary term), used by the
    Stokes gradient-check pipeline
    (reference ``Stokes_gradient_check_dolfin.py:37-39``),
  * the adjoint (Oseen-transpose-like) bilinear form — note the reference
    deliberately omits the viscosity coefficient here
    (``OCP_dolfin.py:344-347``); reproduced as-is:
        aAdj = (∇z:∇v + (∇u v)·z + (∇v u)·z + div(z) q + div(v) r) dx
               − 0.5 [(u·n)(v·z) + (v·n)(u·z)] ds(1)
  * P1 mass matrix + RHS for the L2 projection of ∇u
    (reference ``OCP_dolfin.py:328-329``).

Every function here is *element-local*: it maps the local dof vector(s) of a
single cell/facet to the local residual vector. Assembly vmaps these over
all cells (residuals) or vmaps ``jax.jacfwd`` of them (consistent element
matrices — the TPU-native replacement for FFC-generated Jacobian kernels).

An optional tanh-regularized backflow stabilization replaces the plain
−0.5(u·n)(u·v) term, echoing the abandoned dolfinx generation's
``psi_delta = 0.5(u·n·tanh(u·n/δ) − u·n + δ)``
(reference ``old_dolfinx_files/solver_classes/Navier_stokes_solver.py:123-138``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .spaces import TaylorHoodSpace


def split_local(wl: jnp.ndarray):
    """Local mixed dof vector (15,) → (u (6,2), p (3,))."""
    return wl[:12].reshape(6, 2), wl[12:]


def _cell_kinematics(space: TaylorHoodSpace, wl, jinv):
    """Common per-cell quantities at volume quadrature points."""
    u, p = split_local(wl)
    # physical gradients: dphi[q, a, i] = ∂φ_a/∂x_i
    dphi = jnp.einsum("qad,di->qai", space.dphi2_ref, jinv)
    u_q = jnp.einsum("qa,ai->qi", space.phi2, u)           # (nq, 2)
    gu = jnp.einsum("ai,qaj->qij", u, dphi)                # gu[q,i,j] = ∂u_i/∂x_j
    p_q = space.phi1 @ p                                   # (nq,)
    return u, p, dphi, u_q, gu, p_q


def ns_cell_residual(space: TaylorHoodSpace, wl: jnp.ndarray,
                     jinv: jnp.ndarray, detj: jnp.ndarray,
                     nu: float, convection: bool = True) -> jnp.ndarray:
    """Volume part of the NS (or Stokes when convection=False) residual.

    Test-function layout matches the mixed local numbering:
    entries 2a+i are velocity test dof (node a, component i), 12+b pressure.
    """
    _, _, dphi, u_q, gu, p_q = _cell_kinematics(space, wl, jinv)
    w = space.qw * detj                                    # (nq,)
    divu = gu[:, 0, 0] + gu[:, 1, 1]
    # ν ∇u:∇v  +  div(v) p
    rv = jnp.einsum("q,qij,qaj->ai", nu * w, gu, dphi)
    rv = rv + jnp.einsum("q,q,qai->ai", w, p_q, dphi)
    if convection:
        conv = jnp.einsum("qij,qj->qi", gu, u_q)           # (∇u·u)_i
        rv = rv + jnp.einsum("q,qi,qa->ai", w, conv, space.phi2)
    # div(u) q
    rp = jnp.einsum("q,q,qb->b", w, divu, space.phi1)
    return jnp.concatenate([rv.reshape(12), rp])


def ns_facet_residual(space: TaylorHoodSpace, wl: jnp.ndarray,
                      phi2f: jnp.ndarray, normal: jnp.ndarray,
                      wts: jnp.ndarray, f_q: Optional[jnp.ndarray],
                      backflow: str = "none",
                      backflow_delta: float = 0.1) -> jnp.ndarray:
    """Γ₁ facet part of the NS residual: −0.5(u·n)(u·v) − f·v.

    phi2f: (nq, 6) P2 basis at facet quad points; wts: (nq,) weight×length;
    f_q: (nq, 2) control values at the facet quad points (None = no load).
    """
    u, _ = split_local(wl)
    u_q = jnp.einsum("qa,ai->qi", phi2f, u)                # (nq, 2)
    un = u_q @ normal                                      # (nq,)
    if backflow == "off":
        # no stabilization term: load only (the C5 gradient-check form,
        # dolfin_implementation.py:63-64)
        rv = jnp.zeros((6, 2), u_q.dtype)
    elif backflow == "tanh":
        # gen-1 regularization ψ_δ(u·n) in place of u·n
        # (Navier_stokes_solver.py:123-138)
        d = backflow_delta
        coef = 0.5 * (un * jnp.tanh(un / d) - un + d)
        rv = -jnp.einsum("q,q,qi,qa->ai", wts, coef, u_q, phi2f)
    else:
        rv = -0.5 * jnp.einsum("q,q,qi,qa->ai", wts, un, u_q, phi2f)
    if f_q is not None:
        rv = rv - jnp.einsum("q,qi,qa->ai", wts, f_q, phi2f)
    return jnp.concatenate([rv.reshape(12), jnp.zeros(3, rv.dtype)])


def adjoint_cell_residual(space: TaylorHoodSpace, zl: jnp.ndarray,
                          wl: jnp.ndarray, jinv: jnp.ndarray,
                          detj: jnp.ndarray) -> jnp.ndarray:
    """Volume part of the adjoint bilinear form applied to local dofs ``zl``
    of the trial function, tested against all local test dofs.

    NOTE: reproduces the reference exactly, including the absence of the
    viscosity coefficient in the adjoint Laplacian (``OCP_dolfin.py:344``).
    """
    z, r = split_local(zl)
    u, _ = split_local(wl)
    dphi = jnp.einsum("qad,di->qai", space.dphi2_ref, jinv)
    w = space.qw * detj
    z_q = jnp.einsum("qa,ai->qi", space.phi2, z)
    gz = jnp.einsum("ai,qaj->qij", z, dphi)
    r_q = space.phi1 @ r
    u_q = jnp.einsum("qa,ai->qi", space.phi2, u)
    gu = jnp.einsum("ai,qaj->qij", u, dphi)
    divz = gz[:, 0, 0] + gz[:, 1, 1]

    # ∇z : ∇v
    rv = jnp.einsum("q,qij,qaj->ai", w, gz, dphi)
    # inner(grad(u) v, z): test dof (a,j) → φ_a Σ_k gu[k,j] z_k
    rv = rv + jnp.einsum("q,qkj,qk,qa->aj", w, gu, z_q, space.phi2)
    # inner(grad(v) u, z): test dof (a,j) → (Σ_i dphi_a[i] u_i) z_j
    rv = rv + jnp.einsum("q,qai,qi,qj->aj", w, dphi, u_q, z_q)
    # div(v) r
    rv = rv + jnp.einsum("q,q,qai->ai", w, r_q, dphi)
    # div(z) q
    rp = jnp.einsum("q,q,qb->b", w, divz, space.phi1)
    return jnp.concatenate([rv.reshape(12), rp])


def adjoint_facet_residual(zl: jnp.ndarray, wl: jnp.ndarray,
                           phi2f: jnp.ndarray, normal: jnp.ndarray,
                           wts: jnp.ndarray) -> jnp.ndarray:
    """Γ₁ facet part of the adjoint form:
    −0.5[(u·n)(v·z) + (v·n)(u·z)] (``OCP_dolfin.py:346-347``)."""
    z, _ = split_local(zl)
    u, _ = split_local(wl)
    z_q = jnp.einsum("qa,ai->qi", phi2f, z)
    u_q = jnp.einsum("qa,ai->qi", phi2f, u)
    un = u_q @ normal
    uz = jnp.einsum("qi,qi->q", u_q, z_q)
    rv = -0.5 * (jnp.einsum("q,q,qa,qi->ai", wts, un, phi2f, z_q)
                 + jnp.einsum("q,q,qa,i->ai", wts, uz, phi2f, normal))
    return jnp.concatenate([rv.reshape(12), jnp.zeros(3, rv.dtype)])


def p1_mass_cell(space: TaylorHoodSpace, detj: jnp.ndarray) -> jnp.ndarray:
    """P1 scalar mass element matrix (3,3) — for grad(u) L2 projection."""
    return jnp.einsum("q,qa,qb->ab", space.qw * detj, space.phi1, space.phi1)


def gradu_projection_cell_rhs(space: TaylorHoodSpace, ul: jnp.ndarray,
                              jinv: jnp.ndarray, detj: jnp.ndarray
                              ) -> jnp.ndarray:
    """RHS ∫ (∇u)_{ij} φ_b dx per cell. ul: (6,2) local velocity dofs.
    Returns (3, 2, 2): [test node, i, j]."""
    dphi = jnp.einsum("qad,di->qai", space.dphi2_ref, jinv)
    gu = jnp.einsum("ai,qaj->qij", ul, dphi)
    return jnp.einsum("q,qb,qij->bij", space.qw * detj, space.phi1, gu)
