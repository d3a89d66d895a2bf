"""Fused-vs-staged hi-res probe on the TPU.

Three measurements that motivate the staged-pair design and check whether
the stencil-matvec program (scatter-free, much smaller compiled footprint)
lifts the round-2 "fused gd_step at Nx=64 crashes the remote-compile
helper" limitation:

  1. raw dispatch round-trip of the remote-TPU tunnel (a trivial jitted
     program — the fixed cost every host-driven eager op pays),
  2. the FUSED ``system.gd_step`` at Nx=64 (mg + stencil): compile +
     per-iteration wall,
  3. the staged-pair loop (``system.make_staged_pair``) at the same
     config, for comparison.

Run: python scripts/fused_hires_retry.py [--nx 64] [--iters 3]
Appends results to results/hires_mg/fused_retry.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "results/hires_mg"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip-fused", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ocean_jax.config import OCPConfig
    from ocean_jax import system as sys_mod

    out = {"backend": jax.default_backend(), "nx": args.nx}

    # 1. tunnel dispatch RTT
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros(8)
    float(tiny(x)[0])                      # compile
    rtts = []
    for _ in range(12):
        t0 = time.time()
        float(tiny(x)[0])                  # dispatch + host fetch = 1 RT
        rtts.append(time.time() - t0)
    out["dispatch_rtt_median_s"] = float(np.median(rtts))
    print(f"dispatch RTT median {out['dispatch_rtt_median_s']*1e3:.1f} ms",
          flush=True)

    cfg = OCPConfig(ud_experiment="400_buoys",
                    unit_square_resolution=args.nx,
                    use_line_search=True, linear_solver="mg")
    t0 = time.time()
    prob = sys_mod.build_problem(cfg)
    out["build_s"] = time.time() - t0
    f0 = sys_mod.initial_control(prob, case=4)
    print(f"built Nx={args.nx} ndof={prob.space.ndof} "
          f"({out['build_s']:.0f}s)", flush=True)

    # 2. fused gd_step (the round-2 failure mode — retry with stencil)
    if not args.skip_fused:
        try:
            t0 = time.time()
            f, lr = f0, jnp.asarray(cfg.LR)
            res = sys_mod.gd_step(prob, f, lr, use_line_search=True,
                                  max_ls_iters=15)
            j = float(res.J)
            out["fused_compile_plus_first_s"] = time.time() - t0
            times = []
            for i in range(args.iters):
                t0 = time.time()
                res = sys_mod.gd_step(prob, res.f_new, res.lr,
                                      use_line_search=True, max_ls_iters=15)
                j = float(res.J)
                times.append(time.time() - t0)
                print(f"fused it={i} J={j:.6e} lr={float(res.lr):g} "
                      f"t={times[-1]:.2f}s", flush=True)
            out["fused_seconds_per_iter"] = float(np.median(times))
            out["fused_J"] = j
        except Exception as e:                       # noqa: BLE001
            out["fused_error"] = repr(e)[:500]
            print(f"fused FAILED: {e!r}", flush=True)

    # 3. staged pair
    progs = sys_mod.make_staged_pair(prob)
    t0 = time.time()
    f = f0
    lr = float(cfg.LR)
    fwd, j_dev = progs.begin(f.quad)
    j_old = float(j_dev)
    out["staged_compile_plus_first_s"] = time.time() - t0
    times = []
    for i in range(args.iters + 1):
        t0 = time.time()
        z, g, gradj, div_u, adj_ok = progs.grad(f, fwd)
        cond = -cfg.c_armijo * float(gradj)
        for inner in range(15):
            f_c, fwd_c, j_dev = progs.probe(f, g, lr)
            j_new = float(j_dev)
            if j_old - j_new >= lr * cond:
                break
            lr = max(cfg.tau * lr, cfg.LR_MIN)
        j = float(progs.record(fwd.u_values, f_c.quad))
        dt = time.time() - t0
        print(f"staged it={i} J={j:.6e} lr={lr:g} probes={inner+1} "
              f"t={dt:.2f}s", flush=True)
        if i > 0:
            times.append(dt)
        f, fwd, j_old = f_c, fwd_c, j_new
    out["staged_seconds_per_iter"] = float(np.median(times))
    out["staged_J"] = j

    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "fused_retry.json")
    hist = []
    if os.path.exists(path):
        with open(path) as fh:
            hist = json.load(fh)
    hist.append(out)
    with open(path, "w") as fh:
        json.dump(hist, fh, indent=2)
    print("written", path, flush=True)


if __name__ == "__main__":
    main()
