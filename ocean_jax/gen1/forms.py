"""Gen-1 weak-form variants (``old_dolfinx_files/solver_classes/
Navier_stokes_solver.py``).

Differences from the gen-2 forms (transcribed exactly):
  * pressure sign: ``div(u) q − div(v) p`` (``:124-127``: ``F = a + c +
    div_ − b + extra_bt − f_``),
  * boundary stabilization uses the tanh regularization
    ``ψ_δ(u·n) = 0.5(u·n tanh(u·n/δ) − u·n + δ)`` with a PLUS sign:
    ``+0.5 ∫ ψ_δ u·v ds(1)`` (``:133-138``),
  * the adjoint keeps the viscosity coefficient and uses the ψ_δ
    derivative on the boundary (``:175-194``):
    ``ν∇z:∇v + ((u·∇)v)·z + ((v·∇)u)·z + div(v) p̂ − div(z) q̂
      + 0.5[(v·n) ψ'_δ(u·n) (u·z) + ψ_δ (v·z)] ds(1)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.spaces import TaylorHoodSpace
from ..fem.forms import split_local


def gen1_ns_cell_residual(space: TaylorHoodSpace, wl, jinv, detj,
                          nu: float) -> jnp.ndarray:
    u, p = split_local(wl)
    dphi = jnp.einsum("qad,di->qai", space.dphi2_ref, jinv)
    u_q = jnp.einsum("qa,ai->qi", space.phi2, u)
    gu = jnp.einsum("ai,qaj->qij", u, dphi)
    p_q = space.phi1 @ p
    w = space.qw * detj
    divu = gu[:, 0, 0] + gu[:, 1, 1]
    conv = jnp.einsum("qij,qj->qi", gu, u_q)
    rv = (jnp.einsum("q,qij,qaj->ai", nu * w, gu, dphi)
          + jnp.einsum("q,qi,qa->ai", w, conv, space.phi2)
          - jnp.einsum("q,q,qai->ai", w, p_q, dphi))        # − div(v) p
    rp = jnp.einsum("q,q,qb->b", w, divu, space.phi1)       # + div(u) q
    return jnp.concatenate([rv.reshape(12), rp])


def _psi_delta(un, delta):
    return 0.5 * (un * jnp.tanh(un / delta) - un + delta)


def _psi_delta_prime(un, delta):
    """ψ'_δ as written at ``Navier_stokes_solver.py:185-187``:
    0.5(tanh(u·n/δ) + u·n/(δ cosh²(u·n/δ)) − 1)."""
    c = jnp.cosh(un / delta)
    return 0.5 * (jnp.tanh(un / delta) + un / (delta * c * c) - 1.0)


def gen1_ns_facet_residual(wl, phi2f, normal, wts, q_vals, delta: float
                           ) -> jnp.ndarray:
    """+0.5 ∫ ψ_δ(u·n) u·v ds(1) − ∫ q·v ds(1)  (``:133-138``)."""
    u, _ = split_local(wl)
    u_q = jnp.einsum("qa,ai->qi", phi2f, u)
    un = u_q @ normal
    rv = 0.5 * jnp.einsum("q,q,qi,qa->ai", wts, _psi_delta(un, delta),
                          u_q, phi2f)
    if q_vals is not None:
        rv = rv - jnp.einsum("q,qi,qa->ai", wts, q_vals, phi2f)
    return jnp.concatenate([rv.reshape(12), jnp.zeros(3, rv.dtype)])


def gen1_adjoint_cell_residual(space: TaylorHoodSpace, zl, wl, jinv, detj,
                               nu: float) -> jnp.ndarray:
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
    rv = (jnp.einsum("q,qij,qaj->ai", nu * w, gz, dphi)
          + jnp.einsum("q,qkj,qk,qa->aj", w, gu, z_q, space.phi2)
          + jnp.einsum("q,qai,qi,qj->aj", w, dphi, u_q, z_q)
          + jnp.einsum("q,q,qai->ai", w, r_q, dphi))        # + div(v) p̂
    rp = -jnp.einsum("q,q,qb->b", w, divz, space.phi1)      # − div(z) q̂
    return jnp.concatenate([rv.reshape(12), rp])


def gen1_adjoint_facet_residual(zl, wl, phi2f, normal, wts, delta: float
                                ) -> jnp.ndarray:
    """0.5[(v·n) ψ'_δ(u·n)(u·z) + ψ_δ(u·n)(v·z)] ds(1)
    (``Navier_stokes_solver.py:188-194``)."""
    z, _ = split_local(zl)
    u, _ = split_local(wl)
    z_q = jnp.einsum("qa,ai->qi", phi2f, z)
    u_q = jnp.einsum("qa,ai->qi", phi2f, u)
    un = u_q @ normal
    uz = jnp.einsum("qi,qi->q", u_q, z_q)
    rv = 0.5 * (jnp.einsum("q,q,qa,i->ai", wts,
                           _psi_delta_prime(un, delta) * uz, phi2f, normal)
                + jnp.einsum("q,q,qa,qi->ai", wts, _psi_delta(un, delta),
                             phi2f, z_q))
    return jnp.concatenate([rv.reshape(12), jnp.zeros(3, rv.dtype)])
