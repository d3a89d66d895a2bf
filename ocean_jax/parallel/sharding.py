"""Multi-chip scaling: buoy-ensemble data parallelism over a device mesh.

The reference is serial (its abandoned gen-1 used MPI+PETSc ghost updates,
SURVEY §2.3/§5.8). The TPU-native replacement shards the BUOY axis across
devices with ``shard_map`` over a 1-D ``jax.sharding.Mesh``:

  * primal/adjoint buoy ODEs and point interpolation run on local buoy
    shards (embarrassingly parallel),
  * the point-source RHS is accumulated per shard and ``psum``-reduced
    over the ICI (replacing gen-1's ``b.ghostUpdate``/rank-aware
    PointSource ownership),
  * the tracking cost is a ``psum`` (replacing ``comm.allreduce``),
  * NS/adjoint saddle solves run replicated (dofs are small relative to
    the 10⁴-buoy ODE workload; dof sharding is the high-resolution
    extension path).

Buoy counts are padded to a multiple of the device count; padded lanes
carry weight 0 everywhere.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import system as sys_mod
from ..adjoint.point_sources import point_source_rhs
from ..fem import assemble
from ..fem.interpolate import boundary_eval_velocity
from ..ode import solve_primal_ode, solve_adjoint_ode
from ..solve import solve_operator


def make_buoy_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), ("buoy",))


def make_2d_mesh(n_dof: int, n_buoy: int, devices=None) -> Mesh:
    """2-D device mesh ("dof", "buoy"): dof/cell model parallelism for the
    saddle solves × buoy data parallelism for the ODE/point-source stages
    (SURVEY §5.8 — the high-resolution multi-chip layout)."""
    devices = jax.devices() if devices is None else devices
    assert len(devices) >= n_dof * n_buoy
    arr = np.array(devices[: n_dof * n_buoy]).reshape(n_dof, n_buoy)
    return Mesh(arr, ("dof", "buoy"))


def pad_buoys(u_d: jnp.ndarray, x0: jnp.ndarray, n_dev: int,
              center) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pad the buoy axis to a multiple of n_dev. Padded buoys sit at the
    domain center with weight 0."""
    K = u_d.shape[0]
    K_pad = ((K + n_dev - 1) // n_dev) * n_dev
    pad = K_pad - K
    weights = jnp.concatenate([jnp.ones(K), jnp.zeros(pad)])
    u_d_p = jnp.concatenate(
        [u_d, jnp.zeros((pad,) + u_d.shape[1:], u_d.dtype)])
    x0_p = jnp.concatenate(
        [x0, jnp.broadcast_to(jnp.asarray(center), (pad, 2))])
    return u_d_p, x0_p, weights


def make_sharded_step(prob: "sys_mod.OCPProblem", mesh: Mesh,
                      use_line_search: bool = False, tau: float = 0.5,
                      c_armijo: float = 1e-4, lr_min: float = 1e-6,
                      max_ls_iters: int = 40):
    """Build a jitted multi-device GD step: (f_quad, f_p2, lr) →
    (f_quad', f_p2', lr', J, mask_count, diverged).

    The returned callable is the full training step of the flagship model,
    sharded over the buoy axis of ``mesh``.
    """
    n_dev = mesh.devices.size
    u_d_p, x0_p, wts = pad_buoys(prob.u_d, prob.x0, n_dev, prob.center)

    def buoy_forward_shard(u, x0_s, u_d_s, w_s):
        """Per-shard: primal ODE + local tracking cost."""
        ode = solve_primal_ode(prob.space, u, x0_s, prob.h, prob.nt,
                               prob.center)
        local = 0.5 * jnp.sum(
            prob.h * jnp.sum((ode.u_values - u_d_s) ** 2, axis=-1)
            * w_s[:, None])
        part_a = jax.lax.psum(local, "buoy")
        return ode.x, ode.u_values, ode.mask, part_a

    def buoy_adjoint_shard(u, grad_u, x_s, uv_s, u_d_s, mask_s, w_s):
        """Per-shard: adjoint ODE + point-source partial RHS, psum'd."""
        mu = solve_adjoint_ode(prob.space, grad_u, x_s, uv_s, u_d_s,
                               mask_s, prob.h)
        mask_eff = mask_s | (w_s == 0)
        b_local = point_source_rhs(prob.space, u, x_s, mu, u_d_s,
                                   mask_eff, prob.h, prob.center)
        return jax.lax.psum(b_local, "buoy")

    fwd_sharded = jax.shard_map(
        buoy_forward_shard, mesh=mesh,
        in_specs=(P(), P("buoy"), P("buoy"), P("buoy")),
        out_specs=(P("buoy"), P("buoy"), P("buoy"), P()))
    adj_sharded = jax.shard_map(
        buoy_adjoint_shard, mesh=mesh,
        in_specs=(P(), P(), P("buoy"), P("buoy"), P("buoy"), P("buoy"),
                  P("buoy")),
        out_specs=P())

    def tracking_cost(u, f_quad):
        """Replicated boundary (Tikhonov) part of J."""
        return 0.5 * prob.alpha * jnp.sum(
            prob.bq.weights * jnp.sum(f_quad ** 2, axis=-1))

    @jax.jit
    def step(f_quad, f_p2, lr):
        res = sys_mod.solve_ns(prob, f_quad)          # replicated solve
        u, _ = prob.space.split(res.w)
        x, uv, mask, part_a = fwd_sharded(u, x0_p, u_d_p, wts)
        grad_u = prob.projector.project(prob.space, u)
        b = adj_sharded(u, grad_u, x, uv, u_d_p, mask, wts)
        op = assemble.adjoint_operator(prob.space, prob.bq, res.w,
                                       prob.bc_dofs)
        z = solve_operator(op, b, prob.bc_vals)
        zu, _ = prob.space.split(z)
        z_quad = boundary_eval_velocity(prob.space, prob.bq, zu)
        g_quad = prob.alpha * f_quad - z_quad
        g_p2 = prob.alpha * f_p2 - zu

        if use_line_search:
            gradj = -jnp.sum(prob.bq.weights
                             * jnp.sum(g_quad ** 2, axis=-1))
            cond_thresh = -c_armijo * gradj
            j_old = part_a + tracking_cost(u, f_quad)

            def ls_cost(lr_):
                fq = f_quad - lr_ * g_quad
                r = sys_mod.solve_ns(prob, fq)
                u_ls, _ = prob.space.split(r.w)
                _, _, _, pa = fwd_sharded(u_ls, x0_p, u_d_p, wts)
                return pa + tracking_cost(u_ls, fq)

            def ls_cond(state):
                lr_, it = state
                accept = (j_old - ls_cost(lr_)) >= lr_ * cond_thresh
                return (~accept) & (it < max_ls_iters)

            def ls_body(state):
                lr_, it = state
                return (jnp.maximum(tau * lr_, lr_min), it + 1)

            lr, _ = jax.lax.while_loop(ls_cond, ls_body,
                                       (lr, jnp.asarray(0)))

        f_quad_new = f_quad - lr * g_quad
        f_p2_new = f_p2 - lr * g_p2
        j_rec = part_a + tracking_cost(u, f_quad_new)
        mask_count = jnp.sum(mask * wts)
        # the LU-reuse Newton fast path can diverge on stale factors
        # (solve/newton.py:79-86); surface it so callers can re-solve
        # with fresh factorizations instead of propagating NaN
        diverged = ((~jnp.isfinite(res.residual_norm))
                    | (~jnp.isfinite(j_rec)))
        return f_quad_new, f_p2_new, lr, j_rec, mask_count, diverged

    return step


def make_sharded_step_2d(prob: "sys_mod.OCPProblem", mesh: Mesh):
    """Full GD step over a 2-D ("dof", "buoy") mesh: the NS Newton and
    adjoint saddle solves run FGMRES whose exact fp64 matvec is CELL-
    sharded over the "dof" axis (psum over ICI — the PETSc-distributed-
    matvec role of the abandoned MPI generation), composed with buoy-axis
    data parallelism for the ODE / point-source / cost stages.

    Requires ``prob.linear_solver == "mg"`` — at multi-chip scale the dense
    LU is already past its cap, so the dof-sharded path IS the two-grid
    FGMRES path; the (small) two-grid preconditioner stays replicated.

    Returns (f_quad, f_p2, lr) → (f_quad', f_p2', lr', J, mask_count,
    diverged), line search off (the limits configuration).
    """
    from ..solve import mg as mg_mod
    from .dof_sharding import make_sharded_matvec

    assert prob.linear_solver == "mg" and prob.mg is not None, (
        "the 2-D sharded step runs the mg linear-solver path")
    assert mesh.axis_names == ("dof", "buoy")
    n_buoy_dev = mesh.shape["buoy"]
    u_d_p, x0_p, wts = pad_buoys(prob.u_d, prob.x0, n_buoy_dev, prob.center)

    def matvec_of(op):
        return make_sharded_matvec(op, mesh)

    def buoy_forward_shard(u, x0_s, u_d_s, w_s):
        ode = solve_primal_ode(prob.space, u, x0_s, prob.h, prob.nt,
                               prob.center)
        local = 0.5 * jnp.sum(
            prob.h * jnp.sum((ode.u_values - u_d_s) ** 2, axis=-1)
            * w_s[:, None])
        return ode.x, ode.u_values, ode.mask, jax.lax.psum(local, "buoy")

    def buoy_adjoint_shard(u, grad_u, x_s, uv_s, u_d_s, mask_s, w_s):
        mu = solve_adjoint_ode(prob.space, grad_u, x_s, uv_s, u_d_s,
                               mask_s, prob.h)
        mask_eff = mask_s | (w_s == 0)
        b_local = point_source_rhs(prob.space, u, x_s, mu, u_d_s,
                                   mask_eff, prob.h, prob.center)
        return jax.lax.psum(b_local, "buoy")

    fwd_sharded = jax.shard_map(
        buoy_forward_shard, mesh=mesh,
        in_specs=(P(), P("buoy"), P("buoy"), P("buoy")),
        out_specs=(P("buoy"), P("buoy"), P("buoy"), P()))
    adj_sharded = jax.shard_map(
        buoy_adjoint_shard, mesh=mesh,
        in_specs=(P(), P(), P("buoy"), P("buoy"), P("buoy"), P("buoy"),
                  P("buoy")),
        out_specs=P())

    @jax.jit
    def step(f_quad, f_p2, lr):
        def residual(w):
            return assemble.ns_residual(prob.space, prob.bq, w, f_quad,
                                        prob.nu)

        def operator(w):
            return assemble.ns_operator(prob.space, prob.bq, w, prob.nu,
                                        prob.bc_dofs)

        def coarse_operator(w):
            w_c = mg_mod.inject_state(prob.mg, prob.space, w)
            return assemble.ns_operator(prob.mg.space_c, prob.mg.bq_c,
                                        w_c, prob.nu, prob.mg.bc_dofs_c)

        res = mg_mod.newton_solve_mg(
            residual, operator, coarse_operator, prob.mg, prob.space,
            jnp.zeros(prob.space.ndof), prob.bc_dofs, prob.bc_vals,
            matvec_of=matvec_of)
        u, _ = prob.space.split(res.w)
        x, uv, mask, part_a = fwd_sharded(u, x0_p, u_d_p, wts)
        grad_u = prob.projector.project(prob.space, u)
        b = adj_sharded(u, grad_u, x, uv, u_d_p, mask, wts)
        op = assemble.adjoint_operator(prob.space, prob.bq, res.w,
                                       prob.bc_dofs)
        w_c = mg_mod.inject_state(prob.mg, prob.space, res.w)
        op_c = assemble.adjoint_operator(prob.mg.space_c, prob.mg.bq_c,
                                         w_c, prob.mg.bc_dofs_c)
        adj = mg_mod.solve_operator_mg(op, op_c, prob.mg, prob.space, b,
                                       prob.bc_vals, matvec_of=matvec_of)
        zu, _ = prob.space.split(adj.x)
        z_quad = boundary_eval_velocity(prob.space, prob.bq, zu)
        g_quad = prob.alpha * f_quad - z_quad
        g_p2 = prob.alpha * f_p2 - zu

        f_quad_new = f_quad - lr * g_quad
        f_p2_new = f_p2 - lr * g_p2
        part_b = 0.5 * prob.alpha * jnp.sum(
            prob.bq.weights * jnp.sum(f_quad_new ** 2, axis=-1))
        j_rec = part_a + part_b
        mask_count = jnp.sum(mask * wts)
        diverged = ((~jnp.isfinite(res.residual_norm))
                    | (~jnp.isfinite(j_rec))
                    | (~adj.converged))
        return f_quad_new, f_p2_new, lr, j_rec, mask_count, diverged

    return step
