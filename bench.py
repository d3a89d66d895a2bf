"""Headline benchmark: seconds per GD iteration at 10,000 buoys, Nx=32.

Baseline (BASELINE.md / plotting/histogram_plotting.py:9-10): the reference
FEniCS/dolfin CPU implementation takes 1500 s per gradient-descent
iteration at K=10⁴ (unit square Nx=32, line search off — the
Pipeline_limits configuration). vs_baseline = 1500 / our_seconds.

Prints ONE JSON line:
  {"metric": "gd_iteration_seconds_10000_buoys", "value": <s>,
   "unit": "s", "vs_baseline": <speedup>}

The measured step is the FULL outer iteration (primal NS Newton solve +
∇u projection + primal/adjoint buoy ODEs + point-source RHS + adjoint NS
solve + control update + cost), identical in content to the reference's
"outer loop" timing window (OCP_dolfin.py:313-375).

Extra modes (reproducible versions of the round-1 /tmp profiles):
  --stages    per-stage breakdown of the K=10⁴ iteration (Newton, primal
              ODE, ∇u projection, adjoint ODE, point sources, adjoint
              solve) with achieved-TFLOP/s estimates for the LU stages;
              writes results/bench_stages/stages.json
  --multi-k   iteration time at K=100/400/10000 vs the reference's
              11.98 / 77.82 / 1500 s CPU baselines
              (plotting/histogram_plotting.py:9-10);
              writes results/bench_stages/multi_k.json
"""

import argparse
import json
import os
import time

import numpy as np

# Persistent XLA compile cache (verified working through the axon tunnel:
# cross-process recompile of the same program drops 3.8 s -> 0.5 s). The
# flagship fused-step compile is minutes; this makes driver reruns and
# crash-resumes nearly free. setdefault so an explicit env wins.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

BASELINE_SECONDS = 1500.0          # reference CPU, K=10^4 (BASELINE.md)
K_EXPERIMENT = "10000_buoys"
# reference CPU seconds per GD iteration by buoy count
# (plotting/histogram_plotting.py:9-10 — incl. the K=10 latency floor,
# the one cell where the serial CPU's 0.10 s beats a remote-chip
# iteration's fixed program overhead)
K_BASELINES = {"10_buoys": 0.10, "100_buoys": 11.98, "400_buoys": 77.82,
               "10000_buoys": 1500.0}


def _build(k_experiment=K_EXPERIMENT):
    """The benchmark problem with the TPU fast paths on (all tested equal
    to the reference-exact paths): one LU per Newton solve + corrected
    steps; the fused Pallas point-source kernel + explicit-inverse dense
    applies — the winning psrc_micro cell on hardware (0.370 s vs 0.671
    ozaki / 1.332 sorted+lu at K=10⁴,
    results/bench_stages/psrc_micro.json; J parity ≤1e-14 rel and control
    parity ≤4e-12 across all cells)."""
    import dataclasses
    import jax.numpy as jnp
    from ocean_jax.config import OCPConfig
    from ocean_jax import system as sys_mod
    from ocean_jax.pipelines.limits import ensure_ud

    cfg = OCPConfig(ud_experiment=k_experiment, unit_square_resolution=32,
                    use_line_search=False, num_steps=1,
                    # fused Pallas point-source kernel (location + basis +
                    # reduction in one VMEM pass): 0.370 s vs 0.671 ozaki /
                    # 1.332 sorted+lu per K=10⁴ iteration, control parity
                    # ≤4e-12 (psrc_micro.json)
                    psrc_method="fused",
                    # fused Pallas kernels (primal ODE + adjoint ∇u eval),
                    # verified on hardware: trajectories 7e-15 vs the f64
                    # gather backend; gradient/f_new 4e-9 relative (the
                    # ~1e-13 double-single eval roundoff amplified by the
                    # adjoint solve's conditioning); 2.26 → 1.78 s per GD
                    # iteration at K=10⁴
                    ode_backend="pallas", dense_apply="inverse")
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "data", "ud")
    u_d, x0 = ensure_ud(cfg, cache_dir=cache)
    prob = sys_mod.build_problem(cfg, u_d=u_d, x0=x0)
    prob = dataclasses.replace(prob, newton_reuse_lu=True)
    f = sys_mod.initial_control(prob, case=4)
    return cfg, prob, f, jnp.asarray(cfg.LR)


def _sync(x):
    """Force completion: host transfer of one leaf (block_until_ready is
    unreliable on the tunneled TPU platform)."""
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf)
    return x


def _timeit(fn, *args, reps=3):
    _sync(fn(*args))                       # warm-up / compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _sync(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def stages_main():
    """Per-stage breakdown of one K=10⁴ GD iteration (reproduces the
    BACKLOG.md stage table from a committed script)."""
    import jax
    import jax.numpy as jnp
    from ocean_jax import system as sys_mod
    from ocean_jax.fem import assemble
    from ocean_jax.ode import solve_primal_ode, solve_adjoint_ode
    from ocean_jax.adjoint import point_source_rhs
    from ocean_jax.solve import solve_operator

    cfg, prob, f, lr = _build()
    fq = f.quad
    fwd = _sync(sys_mod.forward(prob, fq))
    u, _ = prob.space.split(fwd.w)
    grad_u = _sync(prob.projector.project(prob.space, u))
    # jit the setup stages: the eager f64 adjoint path materializes every
    # (K·nt, …) intermediate live at K=10⁴ and ResourceExhausts the chip
    mu = _sync(jax.jit(solve_adjoint_ode, static_argnames=())(
        prob.space, grad_u, fwd.x, fwd.u_values, prob.u_d, fwd.mask,
        prob.h))
    b = _sync(jax.jit(point_source_rhs, static_argnames=("method",))(
        prob.space, u, fwd.x, mu, prob.u_d, fwd.mask, prob.h,
        prob.center, method=prob.psrc_method, grid=prob.grid,
        u_values=fwd.u_values))

    # prob travels as a jit ARGUMENT throughout: closed-over problem
    # pytrees (incl. the 364 MB explicit f32 inverse) become HLO
    # constants and trip the remote-compile helper's request cap (413)
    s_newton = jax.jit(lambda p, q: sys_mod.solve_ns(p, q).w)
    s_ode = jax.jit(lambda p, uu: solve_primal_ode(
        p.space, uu, p.x0, p.h, p.nt, p.center).x)
    s_proj = jax.jit(lambda p, uu: p.projector.project(p.space, uu))
    s_adjode = jax.jit(lambda p, gu: solve_adjoint_ode(
        p.space, gu, fwd.x, fwd.u_values, p.u_d, fwd.mask, p.h))
    psrc_method = prob.psrc_method        # plain str — safe to close over
    s_psrc = jax.jit(lambda p, m: point_source_rhs(
        p.space, u, fwd.x, m, p.u_d, fwd.mask, p.h, p.center,
        method=psrc_method, grid=p.grid, u_values=fwd.u_values))

    def adj_solve(p, bb):
        op = assemble.adjoint_operator(p.space, p.bq, fwd.w, p.bc_dofs)
        return solve_operator(op, bb, p.bc_vals,
                              refine_iters=p.refine_iters)
    s_adjsolve = jax.jit(adj_solve)

    # micro-probes: the raw batched field evaluations (K·nt = 2e6 points)
    # that dominate the ODE stages — the optimization targets
    from ocean_jax.fem.interpolate import eval_p1_tensor, eval_velocity
    pts = fwd.x.reshape(-1, 2)
    s_evalp1 = jax.jit(lambda p, q: eval_p1_tensor(p.space, grad_u, q)[0])
    s_evalu = jax.jit(lambda p, q: eval_velocity(p.space, u, q)[0])

    stages = {
        "ns_newton_solve": _timeit(s_newton, prob, fq),
        "primal_ode_scan": _timeit(s_ode, prob, u),
        "gradu_projection": _timeit(s_proj, prob, u),
        "adjoint_ode": _timeit(s_adjode, prob, grad_u),
        "point_sources": _timeit(s_psrc, prob, mu),
        "adjoint_assemble_solve": _timeit(s_adjsolve, prob, b),
        "micro_eval_p1_tensor_2e6pts": _timeit(s_evalp1, prob, pts),
        "micro_eval_velocity_2e6pts": _timeit(s_evalu, prob, pts),
    }
    full = _timeit(
        lambda q: sys_mod.gd_step(prob, f, lr, use_line_search=False).J, fq)

    # achieved-rate estimate for the dominant dense stage: one fp32 LU of
    # the (ndof × ndof) saddle operator is 2/3·N³ flops (the adjoint solve
    # does one more)
    n = prob.space.ndof
    lu_flops = (2.0 / 3.0) * n ** 3
    out = {
        "K": prob.K, "ndof": n, "backend": jax.default_backend(),
        "stages_seconds": stages,
        "stages_sum_seconds": float(sum(stages.values())),
        "full_fused_gd_iteration_seconds": full,
        "lu_tflops_est": lu_flops / stages["adjoint_assemble_solve"] / 1e12,
        "note": ("stage sum > fused time: XLA overlaps/fuses stages inside "
                 "the single gd_step program; lu_tflops_est treats the "
                 "whole adjoint solve as one fp32 LU (lower bound)"),
    }
    os.makedirs("results/bench_stages", exist_ok=True)
    with open("results/bench_stages/stages.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


def multi_k_main():
    """Iteration time vs the reference's per-K CPU baselines.

    Small-K cells additionally time ``system.gd_multi_step`` — N full GD
    iterations fused into one device program (lax.scan over the gd_step
    body, identical (J, LR) trajectory; tests/test_multi_step.py) — which
    amortizes the tunnel's ~29 ms dispatch RTT to RTT/N. That fixed
    program overhead was the one cell where the reference's serial CPU
    won (K=10: 0.10 s/iter vs our 0.134 s per-program floor)."""
    import jax.numpy as jnp
    from ocean_jax import system as sys_mod

    # Amortize only the cells whose no-line-search GD trajectory stays in
    # the convergent regime: at K=400 (and K=10⁴) the limits configuration
    # DIVERGES without line search (J 3.4e3 → 4.3e5, every buoy escapes —
    # the reference's own 400-buoy run does not descend either), so a
    # scan that actually iterates the control drives Newton onto
    # non-convergent states where the while_loop runs to its cap — the
    # measured 0.65 s/iter is NaN-regime Newton, not solver throughput
    # (the per-program cells re-time a fixed control and are unaffected).
    # The K=10/100 trajectories stay clean (scan J == host J exactly).
    AMORTIZE = {"10_buoys": 20, "100_buoys": 20}
    results = {}
    for k_exp, base in K_BASELINES.items():
        cfg, prob, f, lr = _build(k_exp)

        def step(fc):
            return sys_mod.gd_step(prob, fc, lr, use_line_search=False)

        res = step(f)
        assert not bool(res.diverged)
        _sync(res.J)
        t = _timeit(lambda fc: step(fc).J, f)
        cell = {"seconds": t, "baseline_seconds": base,
                "vs_baseline": base / t}
        n_am = AMORTIZE.get(k_exp)
        if n_am:
            def multi(fc):
                _, _, traj = sys_mod.gd_multi_step(prob, fc, lr, n_am,
                                                   use_line_search=False)
                return traj.J
            # trajectory parity evidence: scan path == host loop on the
            # first 3 iterations (rel; NaN-safe — the limits config can
            # legitimately ascend/escape without line search)
            f_h, js_host = f, []
            for _ in range(3):
                r = step(f_h)
                js_host.append(float(r.J))
                f_h = r.f_new
            js_scan = np.asarray(_sync(multi(f))[:3], float)
            rel = np.nanmax(np.abs(js_scan - np.asarray(js_host))
                            / np.maximum(np.abs(js_host), 1e-300))
            t_am = _timeit(lambda fc: multi(fc), f) / n_am
            cell.update({
                "seconds_amortized": t_am,
                "amortized_steps": n_am,
                "vs_baseline_amortized": base / t_am,
                "scan_vs_host_J_max_rel_diff_3it": float(rel)})
            print(json.dumps({
                "metric": f"gd_iteration_seconds_{k_exp}_amortized{n_am}",
                "value": t_am, "unit": "s", "vs_baseline": base / t_am}))
        results[k_exp] = cell
        print(json.dumps({"metric": f"gd_iteration_seconds_{k_exp}",
                          "value": t, "unit": "s",
                          "vs_baseline": base / t}))
    os.makedirs("results/bench_stages", exist_ok=True)
    with open("results/bench_stages/multi_k.json", "w") as fh:
        json.dump(results, fh, indent=2)


def main():
    import jax
    from ocean_jax import system as sys_mod

    cfg, prob, f, lr = _build()

    # one full GD iteration, fused into a single XLA program
    def one_step(f_ctrl, lr_):
        return sys_mod.gd_step(prob, f_ctrl, lr_, use_line_search=False)

    # warm-up / compile
    res = one_step(f, lr)
    _ = float(res.J)               # force completion (tunnel-safe sync)
    assert not bool(res.diverged), (
        "fast-path GD step diverged (stale-LU Newton); rerun with "
        "newton_reuse_lu=False")

    iters = int(os.environ.get("BENCH_ITERS", "3"))
    profile_dir = os.environ.get("BENCH_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    # Fixed-control repetitions: the fused program's work content is
    # identical at any control, and the limits configuration's GD itself
    # diverges without line search (J 3.4e3 → 4.3e5 with every buoy
    # escaping — the reference's own 400-buoy limits run does not descend
    # either), so an iterating loop would time NaN propagation through
    # the stale-LU fast path, not solver work. Production-trajectory
    # timing evidence lives in results/flagship_10k (driver + Armijo,
    # 2.25 s/iter over 30 descending iterations).
    times = []
    for _ in range(iters):
        t0 = time.time()
        res = one_step(f, lr)
        j_it = float(res.J)        # host transfer = authoritative sync
        times.append(time.time() - t0)
        assert np.isfinite(j_it) and not bool(res.diverged), (
            f"non-finite benchmark iteration (J={j_it})")
    if profile_dir:
        jax.profiler.stop_trace()
    value = float(np.median(times))
    print(json.dumps({
        "metric": "gd_iteration_seconds_10000_buoys",
        "value": value,
        "unit": "s",
        "vs_baseline": BASELINE_SECONDS / value,
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--multi-k", action="store_true")
    args = ap.parse_args()
    if args.stages:
        stages_main()
    elif args.multi_k:
        multi_k_main()
    else:
        main()
