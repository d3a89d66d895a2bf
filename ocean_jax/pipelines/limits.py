"""Scalability pipeline — the equivalent of ``Pipeline_limits.py`` (C2).

Differences from the flagship OCP pipeline, mirrored exactly:
  * constant initial control f = (0.1, 0.0) (``Pipeline_limits.py:123``),
  * line search off by default (``:31``),
  * square mesh only,
  * buoy-escape exit threshold is 10 buoys, not K/2 (``:400-402``),
  * final ‖u − ū‖_{L²/H¹} comparison against the stored chapter-6.3.3
    velocity checkpoint, written to ``norm_table.txt`` (``:432-443``).

The 10⁴-buoy case is the headline benchmark (BASELINE.md: 1500 s per GD
iteration on the reference CPU). The reference ships no u_d for it;
``ensure_ud`` synthesizes it with the (verified) constant-inflow
generator from ``ocean_jax.pipelines.ud_construction``.
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from .. import system as sys_mod
from ..config import OCPConfig
from ..fem import assemble
from ..io import artifacts
from ..mesh import rectangle_mesh
from ..opt.driver import run_gradient_descent
from . import ocp as ocp_pipeline
from . import ud_construction


def ensure_ud(cfg: OCPConfig, cache_dir: str = "data/ud"):
    """Return (u_d, x0), synthesizing and caching the measurement data if
    the reference ships none for this buoy count (the 10000-buoy case)."""
    base = os.path.join(cfg.reference_runs_dir, cfg.ud_experiment)
    if os.path.exists(os.path.join(base, "u_d_array.npy")):
        u_d = np.load(os.path.join(base, "u_d_array.npy"))
        x0 = np.load(os.path.join(base, "x_0_array.npy"))[:, 0, :]
        return u_d, x0
    K = cfg.K
    cache = os.path.join(cache_dir, cfg.ud_experiment)
    if os.path.exists(os.path.join(cache, "u_d_array.npy")):
        u_d = np.load(os.path.join(cache, "u_d_array.npy"))
        x0 = np.load(os.path.join(cache, "x_0_array.npy"))[:, 0, :]
        return u_d, x0
    r = ud_construction.run(nx=cfg.unit_square_resolution, K=K,
                            viscosity=cfg.viscosity, T=cfg.T, dt=cfg.dt,
                            out_dir=cache)
    return r["u_values"], r["x"][:, 0, :]


def run(cfg: OCPConfig, write_artifacts: bool = True, verbose: bool = True,
        fast_paths: bool = True):
    """Run the scalability experiment.

    ``fast_paths=True`` (default) turns on the TPU fast paths — LU-reuse
    Newton, the exact bf16-MXU Ozaki point-source reduction, and
    explicit-inverse dense applies (the winning psrc_micro cell on
    hardware: 0.370 s (fused) vs 0.671 ozaki / 1.332 s sorted+lu per
    K=10⁴ GD iteration,
    results/bench_stages/psrc_micro.json) — all tested equal to the
    reference-exact paths; the GD driver detects a diverged stale-LU
    solve and re-solves with fresh factorizations (opt/driver.py), so the
    headline ~2.3 s/iter at K=10⁴ is the out-of-the-box behavior. Pass
    ``fast_paths=False`` to force the conservative per-step-LU paths."""
    cfg = dataclasses.replace(cfg, L_shape=False)
    if fast_paths:
        cfg = dataclasses.replace(
            cfg,
            newton_reuse_lu=True,
            psrc_method=("fused" if cfg.psrc_method == "scatter"
                         else cfg.psrc_method),
            ode_backend=("pallas" if cfg.ode_backend == "gather"
                         else cfg.ode_backend),
            dense_apply=("inverse" if cfg.dense_apply == "lu"
                         else cfg.dense_apply))
    u_d, x0 = ensure_ud(cfg)
    prob = sys_mod.build_problem(cfg, u_d=u_d, x0=x0)
    mesh = rectangle_mesh((0.0, 0.0), (2.0, 2.0),
                          cfg.unit_square_resolution,
                          cfg.unit_square_resolution, cfg.mesh_diagonal)
    run_dir = (artifacts.RunDirectory(cfg.out_dir)
               if write_artifacts else None)

    f = sys_mod.initial_control(prob, case=4)   # constant (0.1, 0.0)

    def on_iteration(i, f_i, fwd, z, j_array):
        if run_dir is None:
            return
        from ..io import checkpoint, plots
        u, _ = prob.space.split(fwd.w)
        plots.plot_velocity_field(
            mesh, np.asarray(u[: mesh.num_vertices]),
            run_dir.path("flow_fields", f"u_{i}_field.png"),
            title=f"u_{i}_field")
        checkpoint.save_control(run_dir.path("checkpoints", "q.npz"), f_i,
                                iteration=i)
        checkpoint.append_control_history(
            run_dir.path("checkpoints", "q_history.npz"), f_i, iteration=i)

    result = run_gradient_descent(cfg, prob, f, escape_threshold=10,
                                  on_iteration=on_iteration,
                                  reuse_ls_forward=getattr(
                                      cfg, "reuse_ls_forward", False),
                                  staged=getattr(cfg, "staged_driver",
                                                 True),
                                  grad_check_dir=(cfg.out_dir if
                                                  write_artifacts else None),
                                  verbose=verbose)

    norm_table = None
    ubar_path = os.path.join(cfg.reference_runs_dir, "u_bar_chapter_6.3.3",
                             "paraview", "checkpoint", "u.h5")
    if os.path.exists(ubar_path) and result.last_fwd is not None:
        from ..io.dolfin_h5 import read_checkpoint_velocity
        try:
            ubar = read_checkpoint_velocity(ubar_path, mesh, prob.space, "u")
        except ValueError as e:
            # the stored u_bar lives on the Nx=32 square mesh; skip the
            # comparison on other resolutions instead of failing the run
            if verbose:
                print(f"skipping u_bar comparison: {e}")
            ubar = None
        if ubar is not None:
            u, _ = prob.space.split(result.last_fwd.w)
            l2, h1 = assemble.velocity_diff_norms(prob.space, u,
                                                  jnp.asarray(ubar))
            norm_table = (float(l2), float(h1))
            if run_dir is not None:
                artifacts.write_norm_table(run_dir.path("norm_table.txt"),
                                           *norm_table)

    if write_artifacts:
        ocp_pipeline._write_final_artifacts(cfg, prob, mesh, result, run_dir)
    return result, prob, norm_table


if __name__ == "__main__":
    from ..cli import build_parser, config_from_args
    _defaults = OCPConfig(ud_experiment="10_buoys", use_line_search=False)
    _args = build_parser("ocean_jax.pipelines.limits",
                         _defaults).parse_args()
    run(config_from_args(_args, _defaults))
