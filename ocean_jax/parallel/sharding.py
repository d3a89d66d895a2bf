"""Multi-chip scaling: buoy-ensemble data parallelism over a device mesh.

The reference is serial (its abandoned gen-1 used MPI+PETSc ghost updates,
SURVEY §2.3/§5.8). The TPU-native replacement shards the BUOY axis across
devices with ``shard_map`` over a 1-D ``jax.sharding.Mesh``:

  * primal/adjoint buoy ODEs and point interpolation run on local buoy
    shards (embarrassingly parallel),
  * the point-source RHS is accumulated per shard and ``psum``-reduced
    over the ICI (replacing gen-1's ``b.ghostUpdate``/rank-aware
    PointSource ownership),
  * the tracking cost is a global reduction over the sharded values
    (GSPMD inserts the collective — replacing ``comm.allreduce``),
  * NS/adjoint saddle solves run replicated on the 1-D mesh, and with a
    CELL-sharded Krylov matvec on the 2-D ("dof", "buoy") mesh.

The sharded steps are the SAME ``system.gd_step`` as the single-chip fast
path — the buoy-axis stages are injected as shard_map'd executors
(``ode_impl``/``adjoint_rhs_impl``) and the dof axis as ``matvec_of``, so
every fast-path option (Pallas ODE kernel, sorted point sources, LU-reuse
Newton, transposed-LU adjoint) and the Armijo semantics are shared, not
re-implemented.

Buoy counts are padded to a multiple of the device count; padded lanes
carry ``buoy_weights`` 0 and drop out of cost/adjoint/escape counting.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import system as sys_mod
from ..control import Control


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


def pad_problem(prob: "sys_mod.OCPProblem", n_dev: int
                ) -> "sys_mod.OCPProblem":
    """The problem with its buoy axis padded to a multiple of n_dev and
    ``buoy_weights`` marking the real lanes."""
    u_d_p, x0_p, wts = pad_buoys(prob.u_d, prob.x0, n_dev, prob.center)
    return dataclasses.replace(prob, u_d=u_d_p, x0=x0_p, buoy_weights=wts)


def _strip_buoys(prob):
    """A 1-lane view of the problem (the buoy arrays are passed to
    shard_map separately, with sharded specs; the rest of the problem is
    replicated)."""
    return dataclasses.replace(prob, u_d=prob.u_d[:1], x0=prob.x0[:1],
                               buoy_weights=None)


def make_buoy_ode_impl(mesh: Mesh):
    """shard_map of ``system._primal_ode`` over the "buoy" mesh axis —
    per-shard ODE scans (or Pallas kernels) on local buoy lanes."""
    def impl(prob, u):
        def shard(prob_nb, u_, x0_s, ud_s, w_s):
            prob_s = dataclasses.replace(prob_nb, u_d=ud_s, x0=x0_s,
                                         buoy_weights=w_s)
            return sys_mod._primal_ode(prob_s, u_)
        # check_vma=False: the per-shard body may lower Pallas kernels
        # (ode_backend="pallas", psrc_method="fused"/"ozaki_pallas") whose
        # pallas_call out_shapes carry no varying-mesh-axes annotation —
        # JAX 0.9's vma check rejects them, and annotating trips interpret-
        # mode constant/vma mismatches inside the kernel trace. Parity with
        # the single-device step is pinned by tests/test_sharding.py.
        return jax.shard_map(
            shard, mesh=mesh,
            in_specs=(P(), P(), P("buoy"), P("buoy"), P("buoy")),
            out_specs=P("buoy"), check_vma=False)(
                _strip_buoys(prob), u, prob.x0, prob.u_d,
                prob.buoy_weights)
    return impl


def make_buoy_adjoint_rhs_impl(mesh: Mesh):
    """shard_map of ``system._adjoint_rhs_body`` over the "buoy" mesh
    axis: per-shard adjoint ODE + point-source partial RHS, psum-reduced
    over the ICI (the ghost-update/rank-ownership role of gen-1's MPI
    PointSource, SURVEY §5.8)."""
    def impl(prob, u, grad_u, x, u_values, mask, x_raw, kfail):
        def shard(prob_nb, u_, gu_, x_s, uv_s, m_s, xr_s, kf_s,
                  x0_s, ud_s, w_s):
            prob_s = dataclasses.replace(prob_nb, u_d=ud_s, x0=x0_s,
                                         buoy_weights=w_s)
            b_local = sys_mod._adjoint_rhs_body(prob_s, u_, gu_, x_s,
                                                uv_s, m_s, xr_s, kf_s)
            return jax.lax.psum(b_local, "buoy")
        # check_vma=False for the same Pallas-kernel reason as
        # make_buoy_ode_impl above.
        return jax.shard_map(
            shard, mesh=mesh,
            in_specs=(P(), P(), P(), P("buoy"), P("buoy"), P("buoy"),
                      P("buoy"), P("buoy"), P("buoy"), P("buoy"),
                      P("buoy")),
            out_specs=P(), check_vma=False)(
                _strip_buoys(prob), u, grad_u, x, u_values, mask,
                x_raw, kfail, prob.x0, prob.u_d, prob.buoy_weights)
    return impl


def make_sharded_step(prob: "sys_mod.OCPProblem", mesh: Mesh,
                      use_line_search: bool = False, tau: float = 0.5,
                      c_armijo: float = 1e-4, lr_min: float = 1e-6,
                      max_ls_iters: int = 40):
    """Build a jitted multi-device GD step: (f_quad, f_p2, lr) →
    (f_quad', f_p2', lr', J, mask_count, diverged).

    The returned callable is the full training step of the flagship model,
    sharded over the buoy axis of ``mesh`` — ``system.gd_step`` itself,
    with the two buoy-axis stages swapped for shard_map'd executors. All
    fast-path options travel with ``prob`` (ode_backend, psrc_method,
    newton_reuse_lu, adjoint_reuse_lu), and the Armijo loop is the
    single-chip one, not a copy.
    """
    n_buoy_dev = mesh.shape["buoy"]
    prob_p = pad_problem(prob, n_buoy_dev)
    ode_impl = make_buoy_ode_impl(mesh)
    adj_impl = make_buoy_adjoint_rhs_impl(mesh)

    # prob as a jit ARGUMENT (a closed-over problem pytree becomes HLO
    # constants and trips the remote-compile helper's request-size cap —
    # system.make_staged_pair)
    @jax.jit
    def step(p, f_quad, f_p2, lr):
        res = sys_mod.gd_step(p, Control(f_quad, f_p2), lr,
                              use_line_search=use_line_search, tau=tau,
                              c_armijo=c_armijo, lr_min=lr_min,
                              max_ls_iters=max_ls_iters,
                              ode_impl=ode_impl, adjoint_rhs_impl=adj_impl)
        mask_count = sys_mod.sum_mask(p, res.fwd.mask)
        return (res.f_new.quad, res.f_new.p2, res.lr, res.J, mask_count,
                res.diverged)

    return lambda f_quad, f_p2, lr: step(prob_p, f_quad, f_p2, lr)


def make_sharded_step_2d(prob: "sys_mod.OCPProblem", mesh: Mesh,
                         use_line_search: bool = False, tau: float = 0.5,
                         c_armijo: float = 1e-4, lr_min: float = 1e-6,
                         max_ls_iters: int = 40):
    """Full GD step over a 2-D ("dof", "buoy") mesh: the NS Newton and
    adjoint saddle solves run FGMRES whose exact fp64 matvec is CELL-
    sharded over the "dof" axis (psum over ICI — the PETSc-distributed-
    matvec role of the abandoned MPI generation), composed with buoy-axis
    data parallelism for the ODE / point-source / cost stages.

    Requires ``prob.linear_solver == "mg"`` — at multi-chip scale the dense
    LU is already past its cap, so the dof-sharded path IS the multigrid
    FGMRES path; the (small) preconditioner hierarchy stays replicated.

    Returns (f_quad, f_p2, lr) → (f_quad', f_p2', lr', J, mask_count,
    diverged). Same unified ``system.gd_step`` as everywhere else.
    """
    from .dof_sharding import make_sharded_matvec

    assert prob.linear_solver == "mg" and prob.mg is not None, (
        "the 2-D sharded step runs the mg linear-solver path")
    assert mesh.axis_names == ("dof", "buoy")
    prob_p = pad_problem(prob, mesh.shape["buoy"])
    ode_impl = make_buoy_ode_impl(mesh)
    adj_impl = make_buoy_adjoint_rhs_impl(mesh)

    def matvec_of(op):
        return make_sharded_matvec(op, mesh)

    @jax.jit
    def step(p, f_quad, f_p2, lr):
        res = sys_mod.gd_step(p, Control(f_quad, f_p2), lr,
                              use_line_search=use_line_search, tau=tau,
                              c_armijo=c_armijo, lr_min=lr_min,
                              max_ls_iters=max_ls_iters,
                              ode_impl=ode_impl, adjoint_rhs_impl=adj_impl,
                              matvec_of=matvec_of)
        mask_count = sys_mod.sum_mask(p, res.fwd.mask)
        return (res.f_new.quad, res.f_new.p2, res.lr, res.J, mask_count,
                res.diverged)

    return lambda f_quad, f_p2, lr: step(prob_p, f_quad, f_p2, lr)
