"""Reduced-gradient-descent driver — the optimization loop of the reference
(``OCP_dolfin.py:309-450``) with identical semantics:

  * fresh buoy mask every iteration,
  * optional Armijo backtracking line search whose LR is NOT reset between
    outer iterations (monotone decreasing across the run, ``:40,415``),
  * control update f ← f − LR(αf − z) (``:426``),
  * J recorded as J(old u_values, new f) (``:426-429``),
  * convergence exit |ΔJ| < conv_crit only for i > 5 (``:444-446``),
  * buoy-escape exit when Σ mask exceeds a threshold (K/2 for the OCP
    pipeline ``:448-450``; 10 for the limits pipeline
    ``Pipeline_limits.py:400``),
  * outer/inner wall-clock timings per iteration (``:313,374-375,384,419``).

The driver is host-level orchestration; each stage is a single jitted XLA
program (forward, adjoint, line-search probe). A fully fused on-device
`system.gd_step` exists for benchmarking/multi-chip use.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import control as ctrl_mod
from .. import system as sys_mod
from ..config import OCPConfig
from ..control import Control
from . import grad_check as grad_check_mod


@dataclasses.dataclass
class GDRunResult:
    j_array: List[float]
    divs_u: List[float]
    x_array: List[np.ndarray]
    outer_times: List[float]
    inner_times: List[float]
    inner_iterations: List[int]
    f: Control
    lr: float
    last_fwd: "sys_mod.ForwardState"
    last_z: jnp.ndarray
    last_u_values: np.ndarray
    exit_reason: str
    iterations_run: int


def _sync(x):
    """Force completion (block_until_ready is unreliable on the tunneled
    TPU platform; a scalar transfer is authoritative)."""
    jax.block_until_ready(x)
    return x


def run_gradient_descent(cfg: OCPConfig, prob: "sys_mod.OCPProblem",
                         f: Control,
                         escape_threshold: Optional[float] = None,
                         df: Optional[Control] = None,
                         on_iteration: Optional[Callable] = None,
                         grad_check_dir: Optional[str] = None,
                         reuse_ls_forward: bool = True,
                         verbose: bool = True) -> GDRunResult:
    """Run up to cfg.num_steps GD iterations. ``escape_threshold`` defaults
    to K/2 (OCP pipeline); the limits pipeline passes 10.

    ``reuse_ls_forward=True`` (default; soaked bit-identical on the
    flagship K=10⁴ and L-shape res-50 production configs —
    results/reuse_soak/soak.json, 1.20×/1.80× per iteration): when the
    Armijo search accepts a step, the accepted probe's forward state IS
    the next iteration's forward state (the updated control equals the
    probed control exactly and the solve is deterministic) — skips one
    NS+ODE solve per iteration with bit-identical results. Pass False to
    reproduce the reference's per-iteration outer/inner timing split
    (see ``OCPConfig.reuse_ls_forward``)."""
    if escape_threshold is None:
        escape_threshold = prob.K / 2
    if df is None:
        df = sys_mod.fd_direction(prob)      # OCP_dolfin.py:148
    # raised scoped-VMEM jits for large dense problems (e.g. L-shape
    # resolution 50: 17.4k dofs OOMs the default-limit LU)
    forward_fn, adjoint_fn = sys_mod.stage_fns(prob)

    lr = cfg.LR
    j_array: List[float] = []
    divs_u: List[float] = []
    x_array: List[np.ndarray] = []
    outer_times: List[float] = []
    inner_times: List[float] = []
    inner_iterations: List[int] = []
    exit_reason = "num_steps"
    last_fwd = last_z = None
    last_u_values = None
    it_run = 0
    fwd_next = None

    for i in range(cfg.num_steps):
        if verbose:
            print(f"Gradient descent iteration: {i}")
        t_outer = time.time()
        fwd = (fwd_next if fwd_next is not None
               else forward_fn(prob, f.quad))
        fwd_next = None
        if (prob.newton_reuse_lu
                and not bool(jnp.isfinite(fwd.newton.residual_norm))):
            # the LU-reuse fast path diverged (stale factors + drifting
            # Jacobian): re-solve this state with fresh factorizations
            if verbose:
                print("fast-path Newton diverged; re-solving with "
                      "fresh factorizations")
            fwd = forward_fn(
                dataclasses.replace(prob, newton_reuse_lu=False), f.quad)
        z = adjoint_fn(prob, fwd)
        g = sys_mod.reduced_gradient(prob, f, z)
        _sync((fwd.w, z, g.quad))
        outer_times.append(time.time() - t_outer)
        if not bool(fwd.newton.converged):
            # the analog of gen-1's assert(converged)
            # (Navier_stokes_solver.py:160-161) — report, don't crash
            print(f"WARNING: Newton did not converge at iteration {i} "
                  f"(residual {float(fwd.newton.residual_norm):.3e})")
        last_fwd, last_z = fwd, z
        last_u_values = np.asarray(fwd.u_values)
        x_array.append(np.asarray(fwd.x))
        it_run = i + 1

        # gradient check at i == 0 (OCP_dolfin.py:378-381)
        if cfg.grad_check and i == 0:
            gradj0 = float(ctrl_mod.boundary_inner(prob.bq, g, df))
            j0 = float(sys_mod.cost(prob, fwd.u_values, f.quad))
            grad_check_mod.grad_test(prob, f, df, j0, gradj0, i,
                                     out_dir=grad_check_dir)

        # Armijo line search (OCP_dolfin.py:384-415)
        t_inner = time.time()
        inner = 0
        if cfg.use_line_search:
            df = Control(-g.quad, -g.p2)                 # mutates df (:387)
            gradj = float(ctrl_mod.boundary_inner(prob.bq, g, df))
            cond = -cfg.c_armijo * gradj
            while True:
                if verbose:
                    print("line search at " + str(lr))
                inner += 1
                j_old = float(sys_mod.cost(prob, fwd.u_values, f.quad))
                f_ls_quad = f.quad + lr * df.quad
                fwd_ls = forward_fn(prob, f_ls_quad)
                j_new = float(sys_mod.cost(prob, fwd_ls.u_values, f_ls_quad))
                if j_old - j_new >= lr * cond:
                    if reuse_ls_forward:
                        # accepted probe control == updated control exactly
                        fwd_next = fwd_ls
                    break
                new_lr = max(cfg.tau * lr, cfg.LR_MIN)
                if new_lr == lr:
                    # floored at LR_MIN: re-probing is the identical solve
                    # (the reference's while loop would spin forever here,
                    # OCP_dolfin.py:415); accept after the one failed probe
                    if verbose:
                        print("line search floored at LR_MIN; accepting")
                    break
                lr = new_lr
                if inner >= cfg.max_line_search_iters:
                    if verbose:
                        print("line search hit safety bound; accepting")
                    break
        inner_times.append(time.time() - t_inner)
        inner_iterations.append(inner)

        # control update + records (OCP_dolfin.py:426-430)
        f = f.axpy(-lr, g)
        j_array.append(float(sys_mod.cost(prob, fwd.u_values, f.quad)))
        u, _ = prob.space.split(fwd.w)
        from ..fem import assemble
        divs_u.append(float(assemble.divergence_l2(prob.space, u)))

        if on_iteration is not None:
            on_iteration(i, f, fwd, z, j_array)

        # exits (OCP_dolfin.py:444-450)
        if i > 5 and abs(j_array[i] - j_array[i - 1]) < cfg.conv_crit:
            if verbose:
                print("cost small enough")
            exit_reason = "converged"
            break
        elif float(fwd.mask.sum()) > escape_threshold:
            if verbose:
                print("too many buoys out of domain .. exiting")
            exit_reason = "buoy_escape"
            break

    return GDRunResult(j_array, divs_u, x_array, outer_times, inner_times,
                       inner_iterations, f, lr, last_fwd, last_z,
                       last_u_values, exit_reason, it_run)
