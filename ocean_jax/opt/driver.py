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
                         staged: bool = True,
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
    (see ``OCPConfig.reuse_ls_forward``).

    ``staged=True`` (default): drive the loop through the consolidated
    ``system.make_staged_pair`` programs — one device program each for
    forward+cost, adjoint+gradient, line-search probe, and the J record,
    instead of per-stage dispatch plus eager cost/inner-product chains.
    On the tunneled TPU each host→device round trip costs ~29 ms, so the
    eager chains put the production loop at 2.25 s/iter at K=10⁴ while
    the same math in consolidated programs runs at ~0.4 s/iter — the
    staged loop closes that gap with bit-identical (J, LR) trajectories
    (tests/test_driver_staged.py). Implies the ``reuse_ls_forward``
    trade. Pass False for the legacy per-stage loop."""
    if escape_threshold is None:
        escape_threshold = prob.K / 2
    if df is None:
        df = sys_mod.fd_direction(prob)      # OCP_dolfin.py:148
    # the staged loop implies the reuse_ls_forward trade; an explicit
    # reuse_ls_forward=False (the reference's per-iteration timing
    # methodology) gets the legacy per-stage loop
    if staged and reuse_ls_forward:
        return _run_gd_staged(cfg, prob, f, escape_threshold, df,
                              on_iteration, grad_check_dir, verbose)
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


def _run_gd_staged(cfg: OCPConfig, prob: "sys_mod.OCPProblem", f: Control,
                   escape_threshold: float, df: Control,
                   on_iteration: Optional[Callable],
                   grad_check_dir: Optional[str],
                   verbose: bool) -> GDRunResult:
    """The production loop over the consolidated staged programs
    (``system.make_staged_pair``): per iteration one ``grad`` program +
    one ``probe`` program per line-search trial + one scalar ``record``
    program; the accepted probe's forward state carries into the next
    iteration (the ``reuse_ls_forward`` trade, bit-identical). Same
    semantics as the legacy loop above — LR not reset, J(old u, new f),
    conv/escape exits, stale-LU divergence re-solve, grad check at i=0 —
    with host work reduced to float transfers of scalars."""
    progs = sys_mod.make_staged_pair(prob)
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

    def fresh_resolve(f_quad):
        """Stale-LU fast-path divergence fallback: re-solve this state
        with fresh per-step factorizations (compiled only if ever hit)."""
        if verbose:
            print("fast-path Newton diverged; re-solving with "
                  "fresh factorizations")
        prob_fresh = dataclasses.replace(prob, newton_reuse_lu=False)
        forward_fn, _ = sys_mod.stage_fns(prob_fresh)
        fwd_f = forward_fn(prob_fresh, f_quad)
        return fwd_f, float(progs.record(fwd_f.u_values, f_quad))

    fwd, j_old = None, None
    for i in range(cfg.num_steps):
        if verbose:
            print(f"Gradient descent iteration: {i}")
        t_outer = time.time()
        if fwd is None:
            fwd, j_dev = progs.begin(f.quad)
            j_old = float(j_dev)
        if (prob.newton_reuse_lu
                and not bool(jnp.isfinite(fwd.newton.residual_norm))):
            fwd, j_old = fresh_resolve(f.quad)
        z, g, gradj_dev, div_dev, adj_ok = progs.grad(f, fwd)
        gradj = float(gradj_dev)           # syncs the adjoint program
        outer_times.append(time.time() - t_outer)
        if not bool(fwd.newton.converged):
            print(f"WARNING: Newton did not converge at iteration {i} "
                  f"(residual {float(fwd.newton.residual_norm):.3e})")
        if not bool(adj_ok):
            print(f"WARNING: adjoint refinement not converged at "
                  f"iteration {i}")
        last_fwd, last_z = fwd, z
        last_u_values = np.asarray(fwd.u_values)
        x_array.append(np.asarray(fwd.x))
        it_run = i + 1

        # gradient check at i == 0 (OCP_dolfin.py:378-381)
        if cfg.grad_check and i == 0:
            gradj0 = float(ctrl_mod.boundary_inner(prob.bq, g, df))
            grad_check_mod.grad_test(prob, f, df, j_old, gradj0, i,
                                     out_dir=grad_check_dir)

        # Armijo line search (OCP_dolfin.py:384-415) — host loop over
        # single-probe programs; j_old is loop-invariant (the legacy loop
        # recomputes it per probe to mirror the reference's statement
        # order, same value)
        t_inner = time.time()
        inner = 0
        if cfg.use_line_search:
            cond = -cfg.c_armijo * gradj
            while True:
                if verbose:
                    print("line search at " + str(lr))
                inner += 1
                f_c, fwd_c, j_dev = progs.probe(f, g, lr)
                j_new = float(j_dev)
                if j_old - j_new >= lr * cond:
                    break
                new_lr = max(cfg.tau * lr, cfg.LR_MIN)
                if new_lr == lr:
                    if verbose:
                        print("line search floored at LR_MIN; accepting")
                    break
                lr = new_lr
                if inner >= cfg.max_line_search_iters:
                    if verbose:
                        print("line search hit safety bound; accepting")
                    break
        else:
            f_c, fwd_c, j_dev = progs.probe(f, g, lr)
            j_new = float(j_dev)
        inner_times.append(time.time() - t_inner)
        inner_iterations.append(inner)

        # control update + records (OCP_dolfin.py:426-430)
        fwd_i = fwd
        f, fwd, j_old = f_c, fwd_c, j_new
        j_array.append(float(progs.record(fwd_i.u_values, f.quad)))
        divs_u.append(float(div_dev))

        if on_iteration is not None:
            on_iteration(i, f, fwd_i, z, j_array)

        # exits (OCP_dolfin.py:444-450)
        if i > 5 and abs(j_array[i] - j_array[i - 1]) < cfg.conv_crit:
            if verbose:
                print("cost small enough")
            exit_reason = "converged"
            break
        elif float(fwd_i.mask.sum()) > escape_threshold:
            if verbose:
                print("too many buoys out of domain .. exiting")
            exit_reason = "buoy_escape"
            break

    return GDRunResult(j_array, divs_u, x_array, outer_times, inner_times,
                       inner_iterations, f, lr, last_fwd, last_z,
                       last_u_values, exit_reason, it_run)
