"""Adjoint-PDE right-hand side: basis-weighted Dirac point sources.

Replaces the reference's hot loop #3 — K×200×2 sequential
``dolfin.PointSource(...).apply(b)`` calls per GD iteration
(``OCP_dolfin.py:353-366``) and the vendored scifem implementation
(``old_dolfinx_files/solver_classes/point_source.py:91-163``) — with one
batched gather (point location + P2 basis evaluation) and one scatter-add.

Point-source application IS the transpose of point interpolation; both are
built from the same basis-evaluation tables (`eval_velocity_basis`), which
makes the adjoint gradient consistent to machine precision
(SURVEY §7.3 "PointSource transpose").

Reference semantics reproduced exactly (``OCP_dolfin.py:353-366``):
  * masked (escaped) buoys are skipped,
  * for each remaining trajectory point: re-evaluate u at the point;
    if the point is outside the domain, use u_x = 0 and place the source
    at the domain center,
  * source magnitude γ = h ((u_d − u_x) + μ), one scalar source per
    velocity component.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.spaces import TaylorHoodSpace
from ..fem.interpolate import _p2_basis_jnp
from ..mesh.locate import locate_points


def point_source_rhs(space: TaylorHoodSpace, u: jnp.ndarray,
                     x: jnp.ndarray, mu: jnp.ndarray, u_d: jnp.ndarray,
                     mask: jnp.ndarray, h: float,
                     center: jnp.ndarray,
                     method: str = "scatter",
                     active_t: jnp.ndarray = None,
                     grid=None, u_values: jnp.ndarray = None) -> jnp.ndarray:
    """Assemble b = Σ_{buoys,k} γ·δ(x_k) into a mixed-space vector.

    u: (n_p2, 2) velocity dofs of the primal solution;
    x, mu, u_d: (K, nt, 2); mask: (K,) bool.

    Methods (all tested equal; TPU timings at K=10⁴, M=2·10⁶ points):
      * "scatter" (default): direct XLA scatter-add — exact, 1.17 s
        (XLA's scatter cost is per-update, not collision-bound),
      * "binned": one-hot MXU contractions per chunk — exact but the
        f64-emulated matmuls cost 2.5 s; useful inside shard_map,
      * "sorted": sort + exact-prefix (triangular-matmul cumsum) segment
        reduction — 0.28 s (4.2×) at full f64 accuracy (measured 1.6e-11
        absolute on 2·10⁶ standard-normal values),
      * "ozaki": slice-decomposed bf16 MXU one-hot contractions
        (``ops/scatter.py::ozaki_segment_sum``) — exact (≤1e-13·scale),
        sort-free, MXU-resident; the production fast path (bench.py).

    Point location runs ONCE: the in-domain test, the u re-evaluation and
    the source-basis tables all come from a single ``locate_points`` pass
    (out-of-domain lanes swap in the precomputed domain-center cell) —
    bit-identical to evaluating at ``where(inside, x, center)`` since
    in-domain lanes reuse the very same (cell, ξ).

    Method "fused" (requires ``grid`` + ``u_values``) runs the whole
    stage — location, basis weights, reduction — as ONE Pallas kernel
    (``adjoint/pallas_psrc.py``). γ uses the primal ODE's own
    evaluations: for unmasked buoys every trajectory point is inside (one
    failed evaluation masks the buoy and overwrites its whole trajectory,
    ``OCP_dolfin.py:209-229``), so u(x_k) IS ``u_values[k]`` — the same
    values the reference's γ re-evaluation produces at `:362` — and
    inactive lanes are zeroed before they could matter. Consistent-mode
    callers pass ``active_t`` + the effective positions: escaped buoys'
    pre-escape slots hold the real u(x_raw[t]) in ``u_values`` and the
    kfail+1 quirk slot holds u(center) (``ode/primal.py`` post-loop), so
    the same γ formula reproduces the XLA consistent path exactly.
    """
    K, nt, _ = x.shape
    if method == "fused":
        if grid is None or u_values is None:
            raise ValueError(
                "psrc_method='fused' needs the half-grid tables and the "
                "primal u_values (system.build_problem wires both)")
        from .pallas_psrc import point_source_image_pallas
        # Last-step-outside edge case (``OCP_dolfin.py:222-228`` vs
        # ``:357-360``): a buoy whose FINAL evaluation fails is NOT
        # masked — the primal stores u_values[nt−1] = 0 and x[nt−1] =
        # center, and the reference's psrc loop then re-evaluates at the
        # stored (recentered) point, getting u(center), NOT 0. Lanes
        # whose stored position equals the center exactly (only the
        # recenter writes produce that) take u(center); everywhere else
        # u(x_k) IS u_values[k]. Same evaluation machinery as the
        # scatter path, so the substitution is exact.
        cell_c, xi_c, _ = locate_points(space.locator, center[None, :])
        phi_c = _p2_basis_jnp(xi_c)
        u_center = jnp.einsum("a,ai->i", phi_c[0],
                              u[space.cell_dofs_p2[cell_c[0]]])
        at_center = ((x[..., 0] == center[0])
                     & (x[..., 1] == center[1]))           # (K, nt)
        u_eff = jnp.where(at_center[..., None], u_center, u_values)
        gamma = h * ((u_d - u_eff) + mu)
        act = (~mask[:, None] if active_t is None else active_t)
        gamma = jnp.where(act[..., None], gamma, 0.0)
        b_vel = point_source_image_pallas(grid, x, gamma)
        return jnp.concatenate([b_vel.reshape(-1),
                                jnp.zeros(space.n_p1)])
    pts = x.reshape(-1, 2)
    cell, xi, inside = locate_points(space.locator, pts)
    phi = _p2_basis_jnp(xi)                                   # (M, 6)
    dofs = space.cell_dofs_p2[cell]                           # (M, 6)
    u_x = jnp.einsum("ma,mai->mi", phi, u[dofs])
    u_x = jnp.where(inside[:, None], u_x, 0.0)
    # sources for out-of-domain points sit at the domain center
    # (OCP_dolfin.py:357-360): swap in its (cell, basis) for masked lanes
    cell_c, xi_c, _ = locate_points(space.locator, center[None, :])
    cell = jnp.where(inside, cell, cell_c[0])
    phi = jnp.where(inside[:, None], phi, _p2_basis_jnp(xi_c[0])[None, :])
    dofs = space.cell_dofs_p2[cell]

    gamma = h * ((u_d.reshape(-1, 2) - u_x) + mu.reshape(-1, 2))
    # default: whole-buoy masking (reference semantics). ``active_t`` is a
    # per-(buoy, time) override used by the consistent-adjoint mode to
    # keep escaped buoys' pre-escape sources.
    active = (jnp.repeat(~mask, nt) if active_t is None
              else active_t.reshape(-1))
    gamma = jnp.where(active[:, None], gamma, 0.0)

    vals = phi[:, :, None] * gamma[:, None, :]                # (M, 6, 2)
    if method in ("binned", "sorted", "ozaki", "ozaki_pallas"):
        if method == "binned":
            from ..ops.scatter import binned_segment_sum
            per_cell = binned_segment_sum(cell, vals.reshape(-1, 12),
                                          space.num_cells)    # (nc, 12)
        elif method == "sorted":
            from ..ops.scatter import sorted_segment_sum
            per_cell = sorted_segment_sum(cell, vals.reshape(-1, 12),
                                          space.num_cells)
        elif method == "ozaki_pallas":
            import jax
            from ..ops.psum_pallas import ozaki_segment_sum_pallas
            per_cell = ozaki_segment_sum_pallas(
                cell, vals.reshape(-1, 12), space.num_cells,
                interpret=jax.default_backend() != "tpu")
        else:
            from ..ops.scatter import ozaki_segment_sum
            per_cell = ozaki_segment_sum(cell, vals.reshape(-1, 12),
                                         space.num_cells)
        b_vel = jnp.zeros((space.n_p2, 2)).at[space.cell_dofs_p2].add(
            per_cell.reshape(-1, 6, 2))
    else:
        b_vel = jnp.zeros((space.n_p2, 2)).at[dofs].add(vals)
    return jnp.concatenate([b_vel.reshape(-1),
                            jnp.zeros(space.n_p1)])
