"""Command-line entry points for the pipelines.

The reference's "CLI" is editing the constants block at the top of each
script (``README.md:13-14``, ``OCP_dolfin.py:20-48``); here every knob is a
flag with the same name and default:

    python -m ocean_jax.pipelines.ocp --ud-experiment 6_buoys --num-steps 50
    python -m ocean_jax.pipelines.limits --ud-experiment 10000_buoys
    python -m ocean_jax.pipelines.initial_control --case 2
"""

from __future__ import annotations

import argparse
import dataclasses

from .config import OCPConfig


def build_parser(prog: str, defaults: OCPConfig) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog=prog, description="ocean_jax pipeline (see OCPConfig)")
    p.add_argument("--ud-experiment", default=defaults.ud_experiment)
    p.add_argument("--num-steps", type=int, default=defaults.num_steps)
    p.add_argument("--out-dir", default=defaults.out_dir)
    p.add_argument("--l-shape", action="store_true",
                   default=defaults.L_shape)
    p.add_argument("--l-shape-resolution", type=int,
                   default=defaults.L_shape_resolution)
    p.add_argument("--unit-square-resolution", type=int,
                   default=defaults.unit_square_resolution)
    p.add_argument("--viscosity", type=float, default=defaults.viscosity)
    p.add_argument("--alpha", type=float, default=defaults.alpha)
    p.add_argument("--dt", type=float, default=defaults.dt)
    p.add_argument("--T", type=float, default=defaults.T)
    p.add_argument("--grad-check", action="store_true",
                   default=defaults.grad_check)
    p.add_argument("--no-line-search", action="store_true")
    p.add_argument("--lr", type=float, default=defaults.LR)
    p.add_argument("--lr-min", type=float, default=defaults.LR_MIN)
    p.add_argument("--lr-max", type=float, default=defaults.LR_MAX)
    p.add_argument("--conv-crit", type=float, default=defaults.conv_crit)
    p.add_argument("--load-q", default="",
                   help="warm-start control checkpoint (.npz)")
    p.add_argument("--checkpoints", action="store_true",
                   default=defaults.checkpoints)
    p.add_argument("--fast", action="store_true",
                   help="enable TPU fast paths (LU reuse, fused Pallas "
                        "point-source kernel, fused Pallas ODE kernels, "
                        "explicit-inverse dense applies)")
    p.add_argument("--ode-backend", default=None,
                   choices=["gather", "grid", "pallas"],
                   help="primal/adjoint buoy-ODE backend (overrides the "
                        "--fast bundle; pallas = fused TPU mega-kernels, "
                        "f64-equivalent double-single)")
    p.add_argument("--psrc-method", default=None,
                   choices=["scatter", "sorted", "binned", "ozaki",
                            "ozaki_pallas", "fused"],
                   help="point-source reduction (overrides --fast bundle)")
    p.add_argument("--dense-apply", default=None,
                   choices=["lu", "inverse"],
                   help="f32 preconditioner application on the dense path")
    p.add_argument("--projector-solver", default=defaults.projector_solver,
                   choices=["auto", "dense", "cg"],
                   help="∇u-projection mass solves: factorized dense or "
                        "matrix-free CG (auto switches at 20k P1 dofs)")
    p.add_argument("--linear-solver", default=defaults.linear_solver,
                   choices=["auto", "dense", "mg"],
                   help="saddle-point linear solver: dense fp32-LU+"
                        "refinement, mg = FGMRES + geometric multigrid "
                        "(auto switches past the dense-LU dof cap)")
    p.add_argument("--mg-pre", type=int, default=defaults.mg_pre,
                   help="V-cycle pre-smoothing sweeps (mg path)")
    p.add_argument("--mg-post", type=int, default=defaults.mg_post)
    p.add_argument("--mg-coarse-krylov", type=int,
                   default=defaults.mg_coarse_krylov,
                   help="convection-aware coarse correction: inner "
                        "FGMRES(k) on the state-assembled coarse operator "
                        "preconditioned by the frozen Stokes coarse solve "
                        "(needed at ν≲0.05 on the mg path; 0 = off)")
    p.add_argument("--mg-leaf-budget", type=int,
                   default=defaults.mg_leaf_budget,
                   help="max velocity dofs of the multigrid leaf level "
                        "(0 = default 20k); smaller forces a deeper "
                        "hierarchy with a cheaper leaf-inverse build")
    p.add_argument("--newton-continuation", type=int,
                   default=defaults.newton_continuation,
                   help="viscosity-continuation rungs for the forward "
                        "Newton solve (vanilla Newton diverges below "
                        "ν≈0.02; 6 rungs reach the ν=0.01 golden regime)")
    p.add_argument("--newton-chord-f32", action="store_true",
                   default=defaults.newton_chord_f32,
                   help="native-f32 chord-correction sweeps on the "
                        "reuse-LU path (f64 convergence test unchanged; "
                        "TPU f64 is emulated, so the sweeps are the "
                        "newton_loop_glue hot spot)")
    return p


def config_from_args(args, defaults: OCPConfig) -> OCPConfig:
    return dataclasses.replace(
        defaults,
        ud_experiment=args.ud_experiment,
        num_steps=args.num_steps,
        out_dir=args.out_dir,
        L_shape=args.l_shape,
        L_shape_resolution=args.l_shape_resolution,
        unit_square_resolution=args.unit_square_resolution,
        viscosity=args.viscosity,
        alpha=args.alpha,
        dt=args.dt,
        T=args.T,
        grad_check=args.grad_check,
        use_line_search=(defaults.use_line_search
                         and not args.no_line_search),
        LR=args.lr,
        LR_MIN=args.lr_min,
        LR_MAX=args.lr_max,
        conv_crit=args.conv_crit,
        load_q=bool(args.load_q),
        load_string=args.load_q,
        checkpoints=args.checkpoints,
        newton_reuse_lu=args.fast,
        # --fast bundle: the hardware-winning psrc_micro cell
        # (results/bench_stages/psrc_micro.json: fused+inverse 0.370 s vs
        # ozaki+inverse 0.671 / sorted+lu 1.332 s per K=10⁴ GD iteration,
        # control parity ≤4e-12 across cells). The fused kernel covers
        # every domain class — uniform square/L-shape, graded tensor
        # meshes, and hole domains (hardware parity ≤1.7e-13,
        # results/bench_stages/psrc_domains_hw.json).
        psrc_method=(args.psrc_method if args.psrc_method is not None
                     else ("fused" if args.fast else "scatter")),
        # --fast also routes the buoy ODEs through the fused Pallas
        # mega-kernels (primal + adjoint recursion): trajectories 7e-15,
        # gradient 4e-9 rel vs the f64 gather backend on hardware
        ode_backend=(args.ode_backend if args.ode_backend is not None
                     else ("pallas" if args.fast
                           else defaults.ode_backend)),
        dense_apply=(args.dense_apply if args.dense_apply is not None
                     else ("inverse" if args.fast
                           else defaults.dense_apply)),
        projector_solver=args.projector_solver,
        linear_solver=args.linear_solver,
        mg_pre=args.mg_pre,
        mg_post=args.mg_post,
        mg_coarse_krylov=args.mg_coarse_krylov,
        mg_leaf_budget=args.mg_leaf_budget,
        newton_continuation=args.newton_continuation,
        newton_chord_f32=args.newton_chord_f32,
    )
