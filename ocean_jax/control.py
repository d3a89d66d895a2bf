"""Boundary control representation.

In the reference the control ``f`` is a UFL expression tree that grows with
every update ``f ← f − LR(αf − z)`` (``OCP_dolfin.py:426``) and is only ever
*observed* through Γ₁ boundary integrals (load ``∫ f·v ds(1)``, cost
``α/2 ∫|f|² ds(1)``, gradient inner products) — dolfin evaluates that tree
at the boundary quadrature points on demand.

The TPU-native representation therefore stores the control **directly as its
values at the Γ₁ quadrature points** (exactly the information dolfin's
quadrature consumes, so the update recursion reproduces the expression-tree
semantics without any re-interpolation error), plus a companion global P2
coefficient vector updated in lockstep, used only for IO parity
(checkpoints ``project(f, W.sub(0).collapse())`` at ``OCP_dolfin.py:441``,
warm starts at ``:151-160``) and plotting.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .fem.spaces import TaylorHoodSpace, BoundaryQuad
from .fem.interpolate import boundary_eval_velocity, interpolate_p2


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Control:
    """quad: (nf, nq, 2) values at Γ₁ quadrature points;
    p2: (n_p2, 2) companion P2 coefficients (IO only)."""

    quad: jnp.ndarray
    p2: jnp.ndarray

    def tree_flatten(self):
        return ((self.quad, self.p2), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def axpy(self, s: float, other: "Control") -> "Control":
        """self + s * other (the control update / FD perturbations)."""
        return Control(self.quad + s * other.quad, self.p2 + s * other.p2)

    def scale(self, s: float) -> "Control":
        return Control(s * self.quad, s * self.p2)


def from_expression(space: TaylorHoodSpace, bq: BoundaryQuad,
                    fn: Callable[[np.ndarray], np.ndarray]) -> Control:
    """Build a control from an analytic expression (exact at quad points —
    the same values dolfin's quadrature of the Expression sees)."""
    pts = np.asarray(bq.points)
    quad = np.asarray(fn(pts.reshape(-1, 2))).reshape(pts.shape)
    return Control(jnp.asarray(quad), interpolate_p2(space, fn))


def from_p2(space: TaylorHoodSpace, bq: BoundaryQuad,
            u: jnp.ndarray) -> Control:
    """Build a control from a P2 velocity field (warm starts / adjoint
    state z; boundary restriction is exact for P2 fields)."""
    return Control(boundary_eval_velocity(space, bq, u), u)


def constant(space: TaylorHoodSpace, bq: BoundaryQuad, vec) -> Control:
    v = np.asarray(vec, dtype=np.float64)
    return from_expression(space, bq,
                           lambda x: np.broadcast_to(v, (len(x), 2)))


def boundary_l2_sq(bq: BoundaryQuad, ctrl: Control) -> jnp.ndarray:
    """∫_{Γ₁} |f|² ds (the cost's Tikhonov term before the α/2 factor,
    ``OCP_dolfin.py:260``)."""
    return jnp.sum(bq.weights * jnp.sum(ctrl.quad ** 2, axis=-1))


def boundary_inner(bq: BoundaryQuad, a: Control, b: Control) -> jnp.ndarray:
    """∫_{Γ₁} a·b ds — the reduced-gradient inner product
    (``OCP_dolfin.py:379,388``)."""
    return jnp.sum(bq.weights * jnp.sum(a.quad * b.quad, axis=-1))
