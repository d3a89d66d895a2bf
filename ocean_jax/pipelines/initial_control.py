"""Initial-control sensitivity study — ``initial_control_test.py`` (C3).

Runs the square-mesh OCP experiment from four different initial controls
(``initial_control_test.py:30-42``):

  case 0: Taylor–Green-like        (−cos πx sin πy, sin πx cos πy)
  case 1: zero
  case 2: component-swapped TG     (sin πx cos πy, −cos πx sin πy)
  case 3: constant (0.1, 0.1)

with line search off by default (``:46``) and, at the end, the
‖u − ū‖_{L²/H¹} table vs the stored ū (``:446-457``).

Bonus TPU capability (SURVEY §2.3 item 4): ``run_all_cases_fused`` runs
all four cases as ONE vmapped XLA program (``opt.ensemble``) — the serial
reference must re-run the whole script per case; ``run_all_cases`` is the
artifact-writing sequential variant (reusing one compiled program).
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp

from .. import system as sys_mod
from ..config import OCPConfig
from ..fem import assemble
from ..io import artifacts
from ..mesh import rectangle_mesh
from ..opt.driver import run_gradient_descent
from . import ocp as ocp_pipeline


def run(cfg: OCPConfig, case: int = 0, write_artifacts: bool = True,
        verbose: bool = True):
    cfg = dataclasses.replace(cfg, L_shape=False)
    prob = sys_mod.build_problem(cfg)
    mesh = rectangle_mesh((0.0, 0.0), (2.0, 2.0),
                          cfg.unit_square_resolution,
                          cfg.unit_square_resolution, cfg.mesh_diagonal)
    run_dir = (artifacts.RunDirectory(cfg.out_dir)
               if write_artifacts else None)
    f = sys_mod.initial_control(prob, case=case)
    result = run_gradient_descent(
        cfg, prob, f,
        grad_check_dir=(cfg.out_dir if write_artifacts else None),
        reuse_ls_forward=getattr(cfg, "reuse_ls_forward", False),
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


def run_all_cases(cfg: OCPConfig, verbose: bool = False):
    """All four initial-control cases; identical mesh/operators, so the
    compiled XLA programs are reused across cases."""
    out = {}
    for case in range(4):
        case_cfg = dataclasses.replace(
            cfg, out_dir=os.path.join(cfg.out_dir, f"case_{case}") + "/")
        out[case] = run(case_cfg, case=case, verbose=verbose)
    return out


def run_all_cases_fused(cfg: OCPConfig):
    """All four initial-control cases as ONE XLA program: a lax.scan over
    iterations of a 4-member vmapped gd_step (``opt.ensemble``), with
    member-wise exit freezing. Returns the EnsembleResult (J/LR/escape
    histories with a leading iteration axis, case axis second)."""
    from ..opt.ensemble import run_ensemble, stack_controls
    cfg = dataclasses.replace(cfg, L_shape=False)
    prob = sys_mod.build_problem(cfg)
    f0 = stack_controls([sys_mod.initial_control(prob, case=c)
                         for c in range(4)])
    lr0 = jnp.full(4, cfg.LR)
    return run_ensemble(
        prob, f0, lr0, num_steps=cfg.num_steps,
        use_line_search=cfg.use_line_search, tau=cfg.tau,
        c_armijo=cfg.c_armijo, lr_min=cfg.LR_MIN,
        max_ls_iters=cfg.max_line_search_iters,
        conv_crit=cfg.conv_crit, escape_threshold=prob.K / 2), prob


if __name__ == "__main__":
    from ..cli import build_parser, config_from_args
    _defaults = OCPConfig(ud_experiment="6_buoys", use_line_search=False)
    _p = build_parser("ocean_jax.pipelines.initial_control", _defaults)
    _p.add_argument("--case", type=int, default=0, choices=range(4))
    _args = _p.parse_args()
    run(config_from_args(_args, _defaults), case=_args.case)
