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

# Persistent XLA compile cache (same as bench.py — verified working
# through the axon tunnel): the staged hires programs cost 100-970 s of
# first-program compilation per resolution; cached reruns/crash-resumes
# skip straight to execution. setdefault so an explicit env wins.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

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
                  line_search=False, cfg=None, adj_max_rounds=4,
                  newton_max_iter=50, newton_refreeze=0,
                  log_newton_steps=False, conv_crit=0.0):
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
    from ocean_jax.control import Control
    from ocean_jax import system as sys_mod
    progs = sys_mod.make_staged_pair(prob)
    lr = float(lr)
    js, times, newton_iters = [], [], []
    adj_rounds, adj_rels = [], []
    start = 0
    if state_path and os.path.exists(state_path):
        st = np.load(state_path)
        f = Control(jnp.asarray(st["quad"]), jnp.asarray(st["p2"]))
        if "adj_rounds" in st.files:
            adj_rounds = [int(v) for v in st["adj_rounds"]]
            adj_rels = [float(v) for v in st["adj_rels"]]
        js = list(st["js"])
        times = list(st["times"])
        newton_iters = [int(v) for v in st["newton_iters"]]
        if "lr" in st.files:
            lr = float(st["lr"])
        start = len(js)
        log(f"{tag}: resuming at iteration {start} (lr={lr:g})", fh)
    tau = cfg.tau if cfg else 0.5
    lr_min = cfg.LR_MIN if cfg else 1e-8
    c_armijo = cfg.c_armijo if cfg else 1e-4
    n_rungs = cfg.newton_continuation if cfg else 0
    ladder = (n_rungs > 0 and prob.nu < 1.0)
    stepped = prob.linear_solver == "mg"
    if stepped:
        # host-driven Newton: every device program is ONE Newton step.
        # The tunneled worker crashes on minutes-long single programs
        # (three observed hires begin/probe crashes); rung/begin/probe
        # forwards all go through bounded step programs.
        stager = sys_mod.make_newton_stager(prob)
        adj_stager = sys_mod.make_adjoint_stager(prob)

        def sync(x):
            np.asarray(x[:1])

        on_step = None
        if log_newton_steps:
            def on_step(it_, rn_, event):
                log(f"{tag}:   newton step {it_} rn={rn_:.3e}"
                    f"{' [refreeze]' if event else ''}", fh)

        def forward(f_, w_warm=None):
            w = jnp.zeros(prob.space.ndof) if w_warm is None else w_warm
            if ladder and w_warm is None:
                ratio = (prob.nu / 1.0) ** (1.0 / (n_rungs + 1))
                for k in range(n_rungs + 1):
                    t0 = time.time()
                    w, rit, rrn, rconv = sys_mod.run_newton_staged(
                        stager, f_.quad, w, ratio ** k,
                        nu_scale=ratio ** k / prob.nu, sync=sync,
                        max_refreeze=newton_refreeze, stagnation_break=8)
                    log(f"{tag}: rung {k} nu={ratio**k:.4g} "
                        f"newton={rit} ({time.time()-t0:.1f}s)", fh)
                    if not rconv and rrn > 1e-3:
                        # A flatlined rung poisons every rung below it
                        # (r4a nx96 it=0 probe at lr=1: rungs 4-6 crawl
                        # to the cap at rn≈1e1 for ~11 min and the final
                        # solve flatlines anyway). Fail the probe fast —
                        # the caller's Armijo loop shrinks LR. The rn
                        # guard keeps slow-but-productive rungs (r3h's
                        # 0.78/step to 1.3e-8) on the ladder.
                        log(f"{tag}: rung {k} flatlined (rn="
                            f"{rrn:.3e}); abandoning probe", fh)
                        return stager.finish(
                            f_.quad, w, jnp.asarray(rit),
                            jnp.asarray(rrn), jnp.asarray(False))
            # stagnation_break: a flatlined solve (ν=0.01 warm probes pin
            # at rn≈6e-2, ~1.000/step) bails after 8 flat steps instead
            # of crawling to the cap — the caller's cold-ladder retry is
            # the productive fallback (observed r4a: 90 wasted programs)
            w, nit, rn, conv = sys_mod.run_newton_staged(
                stager, f_.quad, w, prob.nu, sync=sync,
                max_iter=newton_max_iter, max_refreeze=newton_refreeze,
                on_step=on_step, stagnation_break=8)
            return stager.finish(f_.quad, w, jnp.asarray(nit),
                                 jnp.asarray(rn), jnp.asarray(conv))

        fwd, j_dev = forward(f)

        # Warm-start line-search probes from the accepted state only
        # above ν≈0.05: at the ν=0.01 golden viscosity EVERY warm probe
        # stalls (r4a observation — rn pinned at 6.3e-2 / 8.2e-3 with
        # ~1.000/step, while the cold ladder converges in ~9 steps to
        # 7.8e-11; the frozen Stokes leaf misses the convection the
        # perturbed control introduces), so the warm attempt is pure
        # waste there — go straight to the ladder.
        warm_ok = ladder and prob.nu >= 0.05

        def probe(f_, g_, lr_):
            f_new = stager.axpy(f_, g_, jnp.asarray(lr_))
            fwd_new, j_new_dev = forward(
                f_new, w_warm=(fwd.w if warm_ok else None))
            if warm_ok and not bool(fwd_new.newton.converged):
                # warm Newton can stall at strong convection — retry
                # through the full continuation ladder, which re-finds
                # the new control's basin
                log(f"{tag}: warm probe stalled (rn="
                    f"{float(fwd_new.newton.residual_norm):.3e}); "
                    "cold-ladder retry", fh)
                fwd_new, j_new_dev = forward(f_new)
            return f_new, fwd_new, j_new_dev
    else:
        fwd, j_dev = progs.begin(f.quad)

        def probe(f_, g_, lr_):
            return progs.probe(f_, g_, lr_)
    j_old = float(j_dev)
    for i in range(start, iters):
        t0 = time.time()
        if stepped:
            # one bounded device program per fp64-refinement round (the
            # single fused grad program at Nx=256 — RHS + all rounds —
            # crashed the tunneled TPU worker; Newton-step-sized
            # programs survive)
            adj_last = [0, float("nan")]   # per-iter rounds + final rel

            def on_round(rd, rel):
                adj_last[0], adj_last[1] = rd, rel
                log(f"{tag} it={i} adjoint round {rd}: rel res "
                    f"{rel:.3e}", fh)

            z, g, gradj_dev, div_dev, adj_ok = sys_mod.run_adjoint_staged(
                adj_stager, f, fwd, sync=sync,
                max_rounds=adj_max_rounds, on_round=on_round)
            adj_rounds.append(adj_last[0])
            adj_rels.append(adj_last[1])
        else:
            z, g, gradj_dev, div_dev, adj_ok = progs.grad(f, fwd)
        assert bool(adj_ok), (
            f"{tag}: adjoint FGMRES not converged at iteration {i} — "
            "preconditioner-quality loss would silently corrupt the "
            "gradient (raise --adj-max-rounds; note --mg-coarse-krylov "
            "measurably HURT convergence in this regime — r3h/r3j A/B)")
        if line_search:
            cond = -c_armijo * float(gradj_dev)
            for inner in range(15):
                f_c, fwd_c, j_dev = probe(f, g, lr)
                j_new = float(j_dev)
                # a non-converged probe's J is evaluated at a garbage
                # Newton state — never accept it even if it happens to
                # satisfy Armijo (the flatlined big-LR ν=0.01 probes
                # return rn≈1e1 states); shrink LR like a failed probe
                if bool(fwd_c.newton.converged) and \
                        j_old - j_new >= lr * cond:
                    break
                new_lr = max(tau * lr, lr_min)
                if new_lr == lr:
                    # floored at LR_MIN: a re-probe is the identical
                    # solve (same early-accept as opt/driver.py)
                    break
                lr = new_lr
            if not bool(fwd_c.newton.converged):
                # line search exhausted at the LR floor with a
                # non-converged probe: end the run gracefully on the
                # LAST ACCEPTED state (already in state_path) instead of
                # asserting — a multi-hour TPU run should finish with a
                # usable checkpoint, not a traceback that discards the
                # current iteration (advisor round-4 finding).
                log(f"{tag}: line search exhausted at iteration {i} "
                    f"with a non-converged probe (lr={lr:g}, rn="
                    f"{float(fwd_c.newton.residual_norm):.3e}); "
                    "stopping on the last accepted state", fh)
                break
            log(f"{tag} it={i} line search accepted lr={lr:g} "
                f"({inner + 1} probes)", fh)
        else:
            f_c, fwd_c, j_dev = probe(f, g, lr)
            j_new = float(j_dev)
        # the recorded J: OLD u_values, NEW control (OCP_dolfin.py:429)
        j = float(progs.record(fwd.u_values, f_c.quad))
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
        f, fwd, j_old = f_c, fwd_c, j_new
        if state_path:
            np.savez(state_path, quad=np.asarray(f.quad),
                     p2=np.asarray(f.p2), js=np.asarray(js),
                     times=np.asarray(times),
                     newton_iters=np.asarray(newton_iters),
                     lr=np.asarray(lr),
                     adj_rounds=np.asarray(adj_rounds),
                     adj_rels=np.asarray(adj_rels))
        # reference convergence exit (OCP_dolfin.py:444-446): after the
        # 6th iteration, stop once consecutive recorded Js differ by
        # less than conv_crit
        if (conv_crit > 0 and i > 5
                and abs(js[-1] - js[-2]) < conv_crit):
            log(f"{tag}: converged at it={i} "
                f"(|dJ|={abs(js[-1] - js[-2]):.3e} < {conv_crit:g})", fh)
            break
    return js, times, newton_iters, {
        "adjoint_rounds": adj_rounds,
        "adjoint_final_rel_res": adj_rels}


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
    ap.add_argument("--parity32", action="store_true",
                    help="Nx=32 Armijo-on DESCENDING dense-vs-mg parity "
                         "run (the limits fixed-LR crosscheck diverges "
                         "by design; this is the stronger evidence)")
    ap.add_argument("--parity-iters", type=int, default=6)
    ap.add_argument("--viscosity", type=float, default=1.0,
                    help="robustness probe at the 10_buoys golden "
                         "viscosity (ν=0.01): tags runs nx{N}_nu{v}")
    ap.add_argument("--mg-pre", type=int, default=2,
                    help="V-cycle pre-smoothing sweeps (A/B: 1 halves "
                         "smoothing cost per application)")
    ap.add_argument("--mg-post", type=int, default=2)
    ap.add_argument("--adj-max-rounds", type=int, default=4,
                    help="fp64 refinement rounds for the staged adjoint "
                         "solve (each is one bounded device program; "
                         "deep hierarchies contract ~1e-3/round and "
                         "need ~6 at Nx=256)")
    ap.add_argument("--mg-coarse-krylov", type=int, default=0,
                    help="convection-aware coarse correction (inner "
                         "FGMRES(k) on the state-assembled coarse "
                         "operator); needed at ν=0.01 where the frozen "
                         "Stokes coarse V-cycle stalls warm Newton")
    ap.add_argument("--conv-crit", type=float, default=0.0,
                    help="reference convergence exit |dJ| < crit after "
                         "iteration 5 (OCP_dolfin.py:444-446); 0 = run "
                         "--iters iterations. Tags the run '<tag>_conv'")
    ap.add_argument("--mg-leaf-budget", type=int, default=0,
                    help="max velocity dofs of the mg leaf level (0 = "
                         "default 20k); smaller forces a deeper hierarchy "
                         "with a cheaper leaf-inverse build (Nx=96 at a "
                         "fresh ν needs this — the 20k-budget leaf build "
                         "is an hours-long host-staged inverse)")
    ap.add_argument("--newton-continuation", type=int, default=0,
                    help="viscosity-continuation rungs (vanilla Newton "
                         "from w=0 diverges below ν≈0.02; 4 rungs reach "
                         "the ν=0.01 golden-run regime)")
    ap.add_argument("--newton-max-iter", type=int, default=50,
                    help="stepped-Newton iteration cap (the ν=0.01 "
                         "Nx=64 target solve converges linearly at "
                         "~0.4 decades/step — 50 runs out one decade "
                         "short at rn≈1.3e-8)")
    ap.add_argument("--newton-refreeze", type=int, default=0,
                    help="stall-triggered preconditioner re-freezes at "
                         "the current iterate (VERDICT r2 item 9); "
                         "0 keeps ν=1 runs bit-identical")
    ap.add_argument("--log-newton-steps", action="store_true",
                    help="log per-step Newton residuals of the target-ν "
                         "staged solves")
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

    # --- Nx=32 DESCENDING parity: Armijo line search on -------------------
    # The fixed-LR limits crosscheck above blows up by design (J 1.16 →
    # 360); this run descends and checks both J and the control drift.
    if args.parity32:
        cfgp = OCPConfig(ud_experiment="400_buoys",
                         unit_square_resolution=32,
                         use_line_search=True,
                         num_steps=args.parity_iters)
        t0 = time.time()
        pd = sys_mod.build_problem(cfgp)
        pm = sys_mod.build_problem(
            dataclasses.replace(cfgp, linear_solver="mg"))
        log(f"built Nx=32 parity problems ({time.time()-t0:.1f}s)", fh)

        def descend(prob, tag):
            f = sys_mod.initial_control(prob, case=4)
            lr = jnp.asarray(cfgp.LR)
            js, fq = [], None
            for i in range(args.parity_iters):
                t1 = time.time()
                res = sys_mod.gd_step(prob, f, lr, use_line_search=True,
                                      max_ls_iters=15)
                j = float(res.J)
                assert not bool(res.diverged), (tag, i)
                js.append(j)
                log(f"{tag} it={i} J={j:.6e} lr={float(res.lr):g} "
                    f"t={time.time()-t1:.2f}s", fh)
                f, lr = res.f_new, res.lr
            return js, np.asarray(f.quad)

        jd, fd = descend(pd, "parity32-dense")
        jm, fm = descend(pm, "parity32-mg")
        relj = max(abs(a - b) / abs(a) for a, b in zip(jd, jm))
        relf = float(np.max(np.abs(fd - fm)) / max(np.max(np.abs(fd)), 1e-30))
        log(f"parity32 (line search, {args.parity_iters} its): "
            f"descended={jd[-1] < jd[0]} max rel J diff {relj:.3e} "
            f"rel control drift {relf:.3e}", fh)
        assert jd[-1] < jd[0] and jm[-1] < jm[0], (jd, jm)
        assert relj < 1e-9, relj
        assert relf < 1e-9, relf
        summary["runs"]["nx32_descending_parity"] = {
            "line_search": True, "iters": args.parity_iters,
            "J_dense": jd, "J_mg": jm, "descended": True,
            "max_rel_J_diff": relj, "max_rel_control_drift": relf}
        with open(summary_path, "w") as sf:
            json.dump(summary, sf, indent=2)

    # --- high-resolution runs ---------------------------------------------
    for nx in args.resolutions:
        tag = (f"nx{nx}" if args.viscosity == 1.0
               else f"nx{nx}_nu{args.viscosity:g}")
        if (args.mg_pre, args.mg_post) != (2, 2):
            tag += f"_s{args.mg_pre}{args.mg_post}"
        if args.conv_crit > 0:
            tag += "_conv"
        cfg = OCPConfig(ud_experiment="400_buoys",
                        unit_square_resolution=nx,
                        use_line_search=False, num_steps=args.iters,
                        linear_solver="mg", viscosity=args.viscosity,
                        mg_pre=args.mg_pre, mg_post=args.mg_post,
                        mg_coarse_krylov=args.mg_coarse_krylov,
                        mg_leaf_budget=args.mg_leaf_budget,
                        newton_continuation=args.newton_continuation)
        t0 = time.time()
        prob = sys_mod.build_problem(cfg)
        depth, c = 1, prob.mg
        while c.sub is not None:
            depth, c = depth + 1, c.sub
        log(f"built {tag}: ndof={prob.space.ndof} "
            f"coarse={prob.mg.space_c.ndof} mg_levels={depth + 1} "
            f"leaf_inv_n={0 if c.ainv_c is None else c.ainv_c.shape[0]} "
            f"({time.time()-t0:.1f}s)", fh)
        f = sys_mod.initial_control(prob, case=4)
        adj_stats = None
        if args.staged:
            js, times, nit, adj_stats = run_gd_staged(
                prob, f, args.lr, args.iters, fh, tag,
                state_path=os.path.join(OUT, f"state_{tag}.npz"),
                line_search=args.line_search, cfg=cfg,
                adj_max_rounds=args.adj_max_rounds,
                newton_max_iter=args.newton_max_iter,
                newton_refreeze=args.newton_refreeze,
                log_newton_steps=args.log_newton_steps,
                conv_crit=args.conv_crit)
        else:
            js, times, nit = run_gd(prob, f, jnp.asarray(args.lr),
                                    args.iters, fh, tag,
                                    line_search=args.line_search)
        if not js[-1] < js[0]:
            log(f"{tag}: WARNING J did not descend at lr={args.lr}: "
                f"{js}", fh)
        summary["runs"][tag] = {
            "ndof": prob.space.ndof,
            "coarse_ndof": prob.mg.space_c.ndof,
            "mg_levels": depth + 1,
            "viscosity": args.viscosity,
            "mg_pre": args.mg_pre, "mg_post": args.mg_post,
            "mg_coarse_krylov": args.mg_coarse_krylov,
            "newton_continuation": args.newton_continuation,
            "lr": args.lr, "line_search": args.line_search,
            "J": js, "descended": bool(js[-1] < js[0]),
            "seconds_per_iter": times,
            "newton_iterations": nit,
            "steady_state_seconds": float(np.median(times[1:]))
            if len(times) > 1 else times[0],
        }
        if adj_stats and adj_stats["adjoint_rounds"]:
            # VERDICT r3 weak 4: adjoint round counts in the summary,
            # not just the log
            summary["runs"][tag].update(adj_stats)
        if len(times) > 1:
            summary["runs"][tag]["first_iter_over_steady"] = float(
                times[0] / np.median(times[1:]))
        if args.conv_crit > 0:
            summary["runs"][tag]["conv_crit"] = args.conv_crit
            summary["runs"][tag]["converged_by_crit"] = bool(
                len(js) >= 2 and abs(js[-1] - js[-2]) < args.conv_crit)

    with open(os.path.join(OUT, "summary.json"), "w") as sf:
        json.dump(summary, sf, indent=2)
    log("summary written", fh)


if __name__ == "__main__":
    main()
