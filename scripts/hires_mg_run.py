"""High-resolution "max mesh resolution" study on TPU (limits-style).

The reference scales ``unit_square_resolution`` through PETSc's sparse CPU
LU (``OCP_dolfin.py:28-30``); the TPU dense LU caps at ~21k mixed dofs.
This script exercises the geometric two-grid Krylov path past that cap:

  * Nx=32 cross-check: mg vs dense GD iterations agree to <=1e-9,
  * Nx=64 and Nx=96 gradient-descent iterations (400-buoy measurement
    set, limits configuration: constant initial control, line search off),
    recording J trajectories, Newton/FGMRES health, and per-iteration
    wall-clock.

Writes results/hires_mg/summary.json + log. Run on the TPU:
    python scripts/hires_mg_run.py [--iters 6]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "results/hires_mg"


def log(msg, fh):
    print(msg, flush=True)
    fh.write(msg + "\n")
    fh.flush()


def run_gd(prob, f, lr, iters, fh, tag, line_search=False):
    import jax.numpy as jnp
    from ocean_jax import system as sys_mod
    js, times, newton_iters = [], [], []
    for i in range(iters):
        t0 = time.time()
        res = sys_mod.gd_step(prob, f, lr, use_line_search=line_search,
                              max_ls_iters=15)
        j = float(res.J)                      # host transfer = sync
        dt = time.time() - t0
        assert not bool(res.diverged), f"{tag}: diverged at iteration {i}"
        assert bool(res.fwd.newton.converged), (
            f"{tag}: Newton not converged at iteration {i} "
            f"(residual {float(res.fwd.newton.residual_norm):.3e})")
        js.append(j)
        times.append(dt)
        newton_iters.append(int(res.fwd.newton.iterations))
        log(f"{tag} it={i} J={j:.6e} newton={newton_iters[-1]} "
            f"lr={float(res.lr):g} t={dt:.2f}s", fh)
        f, lr = res.f_new, res.lr
    return js, times, newton_iters


def run_gd_staged(prob, f, lr, iters, fh, tag, state_path=None,
                  line_search=False, cfg=None):
    """Stage-separated GD iteration (forward / adjoint / update as three
    XLA programs). The fused Nx=64 gd_step reproducibly crashes the
    remote-compile worker (known large-HLO failure mode); the staged path
    compiles each sub-program separately — same math, same records.

    ``line_search=True``: host-side Armijo backtracking with the
    reference's semantics (``OCP_dolfin.py:386-415``: LR never resets
    between outer iterations) — at Nx≥64 the fixed-LR limits default
    overshoots (observed J 1.17 → 361 at lr=1), so the hi-res study runs
    with the OCP pipeline's line search instead. Each probe is one
    bounded forward program (tunnel-crash friendly).

    ``state_path``: crash-resume checkpoint — the tunneled TPU worker can
    die mid-run; each completed iteration persists (control, LR, J,
    timing) so a relaunched process continues where the last one
    stopped."""
    import jax.numpy as jnp
    from ocean_jax import control as ctrl_mod
    from ocean_jax.control import Control
    from ocean_jax import system as sys_mod
    forward_fn, adjoint_fn = sys_mod.stage_fns(prob)
    lr = float(lr)
    js, times, newton_iters = [], [], []
    start = 0
    if state_path and os.path.exists(state_path):
        st = np.load(state_path)
        f = Control(jnp.asarray(st["quad"]), jnp.asarray(st["p2"]))
        js = list(st["js"])
        times = list(st["times"])
        newton_iters = [int(v) for v in st["newton_iters"]]
        if "lr" in st.files:
            lr = float(st["lr"])
        start = len(js)
        log(f"{tag}: resuming at iteration {start} (lr={lr:g})", fh)
    for i in range(start, iters):
        t0 = time.time()
        fwd = forward_fn(prob, f.quad)
        z = adjoint_fn(prob, fwd)
        g = sys_mod.reduced_gradient(prob, f, z)
        if line_search:
            df = Control(-g.quad, -g.p2)
            gradj = float(ctrl_mod.boundary_inner(prob.bq, g, df))
            cond = -(cfg.c_armijo if cfg else 1e-4) * gradj
            tau = cfg.tau if cfg else 0.5
            lr_min = cfg.LR_MIN if cfg else 1e-8
            j_old = float(sys_mod.cost(prob, fwd.u_values, f.quad))
            for inner in range(15):
                f_ls = f.quad + lr * df.quad
                fwd_ls = forward_fn(prob, f_ls)
                j_new = float(sys_mod.cost(prob, fwd_ls.u_values, f_ls))
                if j_old - j_new >= lr * cond:
                    break
                lr = max(tau * lr, lr_min)
            log(f"{tag} it={i} line search accepted lr={lr:g} "
                f"({inner + 1} probes)", fh)
        f_new = f.axpy(-lr, g)
        j = float(sys_mod.cost(prob, fwd.u_values, f_new.quad))
        dt = time.time() - t0
        assert np.isfinite(j), f"{tag}: non-finite J at iteration {i}"
        assert bool(fwd.newton.converged), (
            f"{tag}: Newton not converged at iteration {i} "
            f"(residual {float(fwd.newton.residual_norm):.3e})")
        js.append(j)
        times.append(dt)
        newton_iters.append(int(fwd.newton.iterations))
        log(f"{tag} it={i} J={j:.6e} newton={newton_iters[-1]} "
            f"t={dt:.2f}s [staged]", fh)
        f = f_new
        if state_path:
            np.savez(state_path, quad=np.asarray(f.quad),
                     p2=np.asarray(f.p2), js=np.asarray(js),
                     times=np.asarray(times),
                     newton_iters=np.asarray(newton_iters),
                     lr=np.asarray(lr))
    return js, times, newton_iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--resolutions", type=int, nargs="*", default=[64, 96])
    # LR=5 is the reference limits default but (like the reference's own
    # 1-step 400_buoys timing run) does not descend without line search;
    # LR=1 descends at K=400
    ap.add_argument("--lr", type=float, default=1.0)
    ap.add_argument("--skip-crosscheck", action="store_true")
    ap.add_argument("--line-search", action="store_true")
    ap.add_argument("--staged", action="store_true")
    args = ap.parse_args()

    os.makedirs(OUT, exist_ok=True)
    fh = open(os.path.join(OUT, "run.log"), "a")

    import jax
    import jax.numpy as jnp
    from ocean_jax.config import OCPConfig
    from ocean_jax import system as sys_mod
    log(f"backend: {jax.default_backend()}", fh)

    # merge into the existing study (round-2 Nx=64/96 entries stay)
    summary_path = os.path.join(OUT, "summary.json")
    if os.path.exists(summary_path):
        with open(summary_path) as sf:
            summary = json.load(sf)
        summary["backend"] = jax.default_backend()
    else:
        summary = {"backend": jax.default_backend(), "runs": {}}

    # --- Nx=32 cross-check: mg path equals the dense path -----------------
    if not args.skip_crosscheck:
        cfg32 = OCPConfig(ud_experiment="400_buoys",
                          unit_square_resolution=32,
                          use_line_search=False, num_steps=2)
        t0 = time.time()
        pd = sys_mod.build_problem(cfg32)
        pm = sys_mod.build_problem(
            dataclasses.replace(cfg32, linear_solver="mg"))
        f0 = sys_mod.initial_control(pd, case=4)
        lr0 = jnp.asarray(args.lr)
        log(f"built Nx=32 problems ({time.time()-t0:.1f}s); "
            "cross-check...", fh)
        jd, _, _ = run_gd(pd, f0, lr0, 2, fh, "nx32-dense")
        jm, _, _ = run_gd(pm, f0, lr0, 2, fh, "nx32-mg")
        rel = max(abs(a - b) / abs(a) for a, b in zip(jd, jm))
        log(f"nx32 dense-vs-mg max rel J diff: {rel:.3e}", fh)
        assert rel < 1e-9, rel
        summary["runs"]["nx32_crosscheck"] = {
            "J_dense": jd, "J_mg": jm, "max_rel_diff": rel}

    # --- high-resolution runs ---------------------------------------------
    for nx in args.resolutions:
        cfg = OCPConfig(ud_experiment="400_buoys",
                        unit_square_resolution=nx,
                        use_line_search=False, num_steps=args.iters,
                        linear_solver="mg")
        t0 = time.time()
        prob = sys_mod.build_problem(cfg)
        depth, c = 1, prob.mg
        while c.sub is not None:
            depth, c = depth + 1, c.sub
        log(f"built Nx={nx}: ndof={prob.space.ndof} "
            f"coarse={prob.mg.space_c.ndof} mg_levels={depth + 1} "
            f"leaf_inv_n={0 if c.ainv_c is None else c.ainv_c.shape[0]} "
            f"({time.time()-t0:.1f}s)", fh)
        f = sys_mod.initial_control(prob, case=4)
        if args.staged:
            js, times, nit = run_gd_staged(
                prob, f, args.lr, args.iters, fh, f"nx{nx}",
                state_path=os.path.join(OUT, f"state_nx{nx}.npz"),
                line_search=args.line_search, cfg=cfg)
        else:
            js, times, nit = run_gd(prob, f, jnp.asarray(args.lr),
                                    args.iters, fh, f"nx{nx}",
                                    line_search=args.line_search)
        if not js[-1] < js[0]:
            log(f"nx{nx}: WARNING J did not descend at lr={args.lr}: "
                f"{js}", fh)
        summary["runs"][f"nx{nx}"] = {
            "ndof": prob.space.ndof,
            "coarse_ndof": prob.mg.space_c.ndof,
            "mg_levels": depth + 1,
            "lr": args.lr, "line_search": args.line_search,
            "J": js, "descended": bool(js[-1] < js[0]),
            "seconds_per_iter": times,
            "newton_iterations": nit,
            "steady_state_seconds": float(np.median(times[1:])),
        }

    with open(os.path.join(OUT, "summary.json"), "w") as sf:
        json.dump(summary, sf, indent=2)
    log("summary written", fh)


if __name__ == "__main__":
    main()
