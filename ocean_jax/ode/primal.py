"""Primal buoy-advection ODE: explicit Euler, vmapped over the buoy axis.

Replaces the reference's hot loop #1 — K×200 sequential Python→C++ point
evaluations per GD iteration (``OCP_dolfin.py:201-230``) — with a
``lax.scan`` over time vmapped over buoys (SURVEY §2.3 item 1).

The branchless masking reproduces the reference's escape semantics
*exactly* (``OCP_dolfin.py:209-229``): when a buoy's position first leaves
the domain at loop step ``k_fail`` (evaluation at x[k_fail] fails),

  * the buoy's ENTIRE trajectory is overwritten with the domain center,
  * ``buoy_mask[b] = 1``,
  * recorded velocities: u_values[j] for j < k_fail keep their computed
    values, u_values[k_fail] = 0 (the reference breaks before recording),
    u_values[k_fail+1] = u(center) (the post-loop evaluation at the
    now-centered position, ``OCP_dolfin.py:223-225``), later entries 0;

and the unmasked "buoy ran out at the very last step" case
(``OCP_dolfin.py:226-229``): if only the final evaluation at x[nt-1] fails,
u_values[nt-1] = 0 and x[nt-1] = center, with NO mask set.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..fem.spaces import TaylorHoodSpace
from ..fem.interpolate import eval_velocity
from ..mesh.locate import in_domain


class PrimalODEResult(NamedTuple):
    x: jnp.ndarray          # (K, nt, 2) trajectories
    u_values: jnp.ndarray   # (K, nt, 2) velocities along trajectories
    mask: jnp.ndarray       # (K,) bool — escaped buoys (buoy_mask)
    # pre-overwrite data for the consistent-adjoint mode (the reference
    # destroys the pre-escape trajectory, OCP_dolfin.py:213-221):
    x_raw: jnp.ndarray      # (K, nt, 2) positions BEFORE the escape
                            # overwrite (frozen from the failure step on)
    kfail: jnp.ndarray      # (K,) int32 first failing step (nt if none)


def solve_primal_ode(space: TaylorHoodSpace, u: jnp.ndarray,
                     x0: jnp.ndarray, h: float, nt: int,
                     center: jnp.ndarray,
                     unroll: int = 4, grid=None) -> PrimalODEResult:
    """u: (n_p2, 2) velocity dofs; x0: (K, 2) seeds; nt time samples.

    ``unroll`` trades compile time for lower per-step scan overhead (the
    time loop is inherently sequential; each step's work is small relative
    to TPU loop overhead at large K).

    ``grid``: optional ``ode.grideval.GridEval`` — evaluate through the
    table-free half-grid stencil instead of the locate/dofmap gather chain
    (same values to rounding; fewer gathers per step)."""
    if grid is not None:
        from .grideval import velocity_to_grid, eval_velocity_grid
        u_img = velocity_to_grid(grid, u)
        eval_u = lambda pts: eval_velocity_grid(grid, u_img, pts)
    else:
        eval_u = lambda pts: eval_velocity(space, u, pts)
    u_center, _ = eval_u(center)

    def one_buoy(x0_b):
        def step(carry, k):
            pos, failed, kfail = carry
            uv, inside = eval_u(pos)
            fail_now = (~inside) & (~failed)
            failed_new = failed | (~inside)
            kfail = jnp.where(fail_now, k, kfail)
            newpos = jnp.where(failed_new, pos, pos + h * uv)
            u_rec = jnp.where(failed_new, jnp.zeros(2), uv)
            return (newpos, failed_new, kfail), (newpos, u_rec)

        # derive the carry init from x0_b so it inherits x0_b's device-
        # varying annotation (required when vmapped inside shard_map)
        zero_b = (x0_b[0] * 0).astype(jnp.int32)
        init = (x0_b, zero_b > 0, jnp.int32(nt) + zero_b)
        (pos_end, failed, kfail), (xs, us) = jax.lax.scan(
            step, init, jnp.arange(nt - 1, dtype=jnp.int32),
            unroll=unroll)
        x = jnp.concatenate([x0_b[None], xs])                # (nt, 2)
        u_values = jnp.concatenate([us, jnp.zeros((1, 2))])  # (nt, 2)

        x_raw = x                               # pre-overwrite trajectory

        # final evaluation at x[nt-1] (OCP_dolfin.py:223-229)
        last_inside = in_domain(space.locator, x[nt - 1])
        u_last, _ = eval_u(x[nt - 1])
        u_values = u_values.at[nt - 1].set(
            jnp.where(last_inside, u_last, jnp.zeros(2)))
        x = x.at[nt - 1].set(jnp.where(last_inside, x[nt - 1], center))

        # escaped-buoy overwrite (OCP_dolfin.py:213-221 + post-loop eval)
        ks = jnp.arange(nt)
        u_fail = jnp.where((ks < kfail)[:, None], u_values, 0.0)
        u_fail = u_fail.at[:, :].add(
            jnp.where((ks == kfail + 1)[:, None], u_center, 0.0))
        x = jnp.where(failed, jnp.broadcast_to(center, (nt, 2)), x)
        u_values = jnp.where(failed, u_fail, u_values)
        return x, u_values, failed, x_raw, kfail

    x, u_values, mask, x_raw, kfail = jax.vmap(one_buoy)(x0)
    return PrimalODEResult(x, u_values, mask, x_raw, kfail)
