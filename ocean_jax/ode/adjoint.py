"""Adjoint buoy ODE: backward recursion for the costate μ.

Replaces the reference's hot loop #2 (``OCP_dolfin.py:234-252``):

    μ[nt-1] = 0
    μ[k] = μ[k+1] − h ∇u(x[k+1])ᵀ ((u(x[k+1]) − u_d[k+1]) − μ[k+1]),
    k = nt-2 … 0

with a reversed ``lax.scan`` vmapped over buoys. ∇u is the P1-projected
gradient field evaluated at trajectory points (``OCP_dolfin.py:243-245``);
if a point is outside the domain the previous ∇u matrix is reused, exactly
the reference's leftover-variable quirk (``:242-249``; initialized to zeros
— unreachable for unmasked buoys, whose trajectories stay inside).
Masked (escaped) buoys are skipped → μ ≡ 0 (``:237-238``).

Also provides the *implicit* variant used by the coupled NS+ODE gradient
check (``fenics_testing_pipelines/dolfin_implementation.py:107-117``):

    (I + h ∇uᵀ) μ[k] = μ[k+1] − h ∇uᵀ (u(x[k+1]) − u_d[k])

(note the u_d time index k, not k+1 — reproduced as-is), and the gen-1
dolfinx variant (``old_dolfinx_files/solver_classes/ODE_solver.py:123-151``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fem.spaces import TaylorHoodSpace
from ..fem.interpolate import eval_p1_tensor


def solve_adjoint_ode(space: TaylorHoodSpace, grad_u: jnp.ndarray,
                      x: jnp.ndarray, u_values: jnp.ndarray,
                      u_d: jnp.ndarray, mask: jnp.ndarray,
                      h: float) -> jnp.ndarray:
    """Explicit backward recursion (the production pipelines).

    grad_u: (n_p1, 2, 2) projected ∇u; x, u_values, u_d: (K, nt, 2);
    mask: (K,) bool. Returns μ: (K, nt, 2).
    """
    nt = x.shape[1]

    def one_buoy(x_b, uv_b, ud_b, masked):
        def step(carry, k):
            mu_next, g_prev = carry
            g, inside = eval_p1_tensor(space, grad_u, x_b[k + 1])
            g = jnp.where(inside, g, g_prev)
            mu_k = mu_next - h * g.T @ ((uv_b[k + 1] - ud_b[k + 1])
                                        - mu_next)
            return (mu_k, g), mu_k

        # derive carry init from the (device-varying) buoy data so the
        # scan carry types match under shard_map
        zero_b = x_b[0, 0] * 0.0
        init = (jnp.zeros(2) + zero_b, jnp.zeros((2, 2)) + zero_b)
        _, mus = jax.lax.scan(step, init,
                              jnp.arange(nt - 2, -1, -1, dtype=jnp.int32))
        mu = jnp.concatenate([mus[::-1], jnp.zeros((1, 2))])   # (nt, 2)
        return jnp.where(masked, jnp.zeros_like(mu), mu)

    return jax.vmap(one_buoy)(x, u_values, u_d, mask)


def solve_adjoint_ode_implicit(space: TaylorHoodSpace, grad_u: jnp.ndarray,
                               u: jnp.ndarray, x: jnp.ndarray,
                               u_d: jnp.ndarray, h: float,
                               ud_index: str = "k") -> jnp.ndarray:
    """Implicit backward recursion (C5 gradient-check harness / gen-1).

    Solves the 2×2 system (I + h ∇uᵀ) μ[k] = μ[k+1] − h ∇uᵀ (u(x[k+1]) −
    u_d[idx]) in closed form. ``ud_index``: "k" reproduces
    ``dolfin_implementation.py:114``; "k+1" is the consistent variant.
    """
    from ..fem.interpolate import eval_velocity
    nt = x.shape[1]
    shift = 0 if ud_index == "k" else 1

    def one_buoy(x_b, ud_b):
        def step(mu_next, k):
            g, _ = eval_p1_tensor(space, grad_u, x_b[k + 1])
            uv, _ = eval_velocity(space, u, x_b[k + 1])
            a = jnp.eye(2) + h * g.T
            b = mu_next - h * g.T @ (uv - ud_b[k + shift])
            det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
            inv = jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]]) / det
            mu_k = inv @ b
            return mu_k, mu_k

        _, mus = jax.lax.scan(step, jnp.zeros(2),
                              jnp.arange(nt - 2, -1, -1, dtype=jnp.int32))
        return jnp.concatenate([mus[::-1], jnp.zeros((1, 2))])

    return jax.vmap(one_buoy)(x, u_d)
