"""Flagship OCP pipeline — the equivalent of ``OCP_dolfin.py`` (C1).

Full reduced-gradient optimal control on the unit-square ([0,2]²) or
L-shape domain with Armijo line search, gradient checking, per-iteration
artifacts, checkpoints, and the complete figure set. Entry point:

    from ocean_jax.pipelines import ocp
    result = ocp.run(OCPConfig(...))

or ``python -m ocean_jax.pipelines.ocp``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .. import system as sys_mod
from ..config import OCPConfig
from ..io import artifacts, checkpoint, plots
from ..mesh import rectangle_mesh, l_shape_mesh
from ..opt.driver import run_gradient_descent


def run(cfg: OCPConfig, initial_case: int = 0,
        write_artifacts: bool = True, verbose: bool = True,
        plot_all_buoys: bool = False):
    """Run the full OCP experiment; returns the GDRunResult plus problem."""
    prob = sys_mod.build_problem(cfg)
    mesh = (l_shape_mesh(cfg.L_shape_resolution, cfg.mesh_diagonal)
            if cfg.L_shape else
            rectangle_mesh((0.0, 0.0), (2.0, 2.0),
                           cfg.unit_square_resolution,
                           cfg.unit_square_resolution, cfg.mesh_diagonal))

    run_dir = artifacts.RunDirectory(cfg.out_dir) if write_artifacts else None

    # initial control (OCP_dolfin.py:142-160)
    f = sys_mod.initial_control(prob, case=initial_case)
    if cfg.load_q and cfg.load_string:
        f, _, _ = checkpoint.load_control(cfg.load_string, prob.space,
                                          prob.bq)
    if cfg.checkpoints and run_dir is not None:
        ck = run_dir.path("checkpoints", "q.npz")
        if os.path.exists(ck):
            f, lr_ck, _ = checkpoint.load_control(ck, prob.space, prob.bq)

    def on_iteration(i, f_i, fwd, z, j_array):
        if run_dir is None:
            return
        # flow-field snapshot (OCP_dolfin.py:432-437): vertex values of u
        u, _ = prob.space.split(fwd.w)
        u_vertex = np.asarray(u[: mesh.num_vertices])
        plots.plot_velocity_field(
            mesh, u_vertex, run_dir.path("flow_fields", f"u_{i}_field.png"),
            title=f"u_{i}_field")
        # control checkpoint (OCP_dolfin.py:439-441) + LR for resume;
        # q_history.npz is the append=True time-series equivalent
        checkpoint.save_control(run_dir.path("checkpoints", "q.npz"),
                                f_i, iteration=i)
        checkpoint.append_control_history(
            run_dir.path("checkpoints", "q_history.npz"), f_i, iteration=i)

    result = run_gradient_descent(
        cfg, prob, f,
        grad_check_dir=(cfg.out_dir if write_artifacts else None),
        reuse_ls_forward=getattr(cfg, "reuse_ls_forward", False),
        staged=getattr(cfg, "staged_driver", True),
        on_iteration=on_iteration, verbose=verbose)

    if write_artifacts:
        _write_final_artifacts(cfg, prob, mesh, result, run_dir,
                               plot_all_buoys=plot_all_buoys)
    return result, prob


def _write_final_artifacts(cfg, prob, mesh, result, run_dir,
                           plot_all_buoys=False):
    """The post-loop artifact block (``OCP_dolfin.py:452-588``)."""
    plots.plot_mesh(mesh, run_dir.path("mesh.png"), l_shape=cfg.L_shape)
    artifacts.write_timings(run_dir.path("timings.txt"),
                            result.outer_times, result.inner_times,
                            result.inner_iterations)
    checkpoint.save_control(run_dir.path("q_backup", "q.npz"), result.f,
                            lr=result.lr, iteration=result.iterations_run)
    artifacts.write_divergence(run_dir.path("u_divergence.txt"),
                               result.divs_u)
    ud_type = "L-shape" if cfg.L_shape else "custom_ud"
    nx = (cfg.L_shape_resolution if cfg.L_shape
          else cfg.unit_square_resolution)
    artifacts.write_variables(
        run_dir.path("variables.txt"), nx, ud_type, cfg.t0, cfg.T, cfg.dt,
        cfg.viscosity, prob.K, result.lr, cfg.LR_MAX, cfg.LR_MIN,
        cfg.conv_crit, cfg.num_steps)
    artifacts.save_j_array(run_dir.path("J_array.npy"), result.j_array)
    plots.plot_cost(result.j_array, run_dir.path("J.png"))

    # buoy-movement frames for every recorded iteration (:531-552)
    x_d = _desired_trajectories(cfg, prob)
    seeds = np.asarray(prob.x0)
    for k, x_k in enumerate(result.x_array):
        plots.plot_buoy_movement(
            x_k, x_d, seeds,
            run_dir.path("buoy_movements", "frames",
                         f"buoy_movement_{k}.png"),
            l_shape=cfg.L_shape)

    # velocity-comparison time series (:554-567). The reference plots
    # every buoy; we match that up to K=100 and cap beyond (10⁴ PNGs is
    # not a useful artifact set — documented deviation, README
    # "Deliberate deviations" #2; plot_all_buoys=True restores
    # reference-exact output at any K)
    time_interval = np.linspace(cfg.t0, cfg.T, prob.nt)
    u_d = np.asarray(prob.u_d)
    uv = result.last_u_values
    n_plot = prob.K if (plot_all_buoys or prob.K <= 100) else 12
    if n_plot < prob.K:
        with open(run_dir.path("variables.txt"), "a") as fh:
            fh.write(f"per-buoy velocity plots capped at {n_plot} of "
                     f"{prob.K} buoys (plot_all_buoys=False)\n")
    for k in range(n_plot):
        plots.plot_velocity_comparison(
            time_interval, u_d, uv, k, run_dir.path(f"ud_plot_buoy_{k}.png"))

    # final field plot + checkpoints (:569-588)
    u, _ = prob.space.split(result.last_fwd.w)
    plots.plot_velocity_field(mesh, np.asarray(u[: mesh.num_vertices]),
                              run_dir.path("u_field.png"))
    checkpoint.save_fields(run_dir.path("paraview", "velocity.npz"),
                           result.last_fwd.w, prob.space)
    checkpoint.save_fields(run_dir.path("paraview", "checkpoint", "up.npz"),
                           result.last_fwd.w, prob.space)
    # ParaView-readable ASCII XDMF (OCP_dolfin.py:578-582)
    from ..io import xdmf
    xdmf.write_velocity_pressure(
        run_dir.path("paraview", "velocity.xdmf"),
        run_dir.path("paraview", "pressure.xdmf"),
        mesh, np.asarray(result.last_fwd.w), prob.space.n_p2)


def _desired_trajectories(cfg, prob) -> Optional[np.ndarray]:
    """x_d overlays for the buoy-movement frames: stored trajectories for
    square experiments (OCP_dolfin.py:178-181); for the L-shape, the
    analytic 2-point desired-path segments of OCP_dolfin.py:173-174
    (plotted at :545) — buoy 1 horizontal, buoy 2 diagonal, buoy 3
    vertical, each of length 1/π (= ∫₀¹ u_d dt)."""
    if cfg.L_shape:
        s = 1.0 / np.pi
        return np.array([[[0.5, 0.5], [0.5 + s, 0.5]],
                         [[1.0, 0.5], [1.0 + s, 0.5 + s]],
                         [[1.5, 1.0], [1.5, 1.0 + s]]])
    base = os.path.join(cfg.reference_runs_dir, cfg.ud_experiment)
    path = os.path.join(base, "x_0_array.npy")
    if os.path.exists(path):
        return np.load(path)
    return None


if __name__ == "__main__":
    from ..cli import build_parser, config_from_args
    _defaults = OCPConfig(use_line_search=True)
    _args = build_parser("ocean_jax.pipelines.ocp", _defaults).parse_args()
    run(config_from_args(_args, _defaults))
