"""Source-attributed device profile of the hi-res (mg-path) GD iteration.

Answers "where do the 33.7 s/iter at Nx=64 go" with the same
nesting-deduplicated, source-bucketed trace parse as the flagship profile
(``scripts/fused_profile.py::parse_trace``) — run on the TPU:

    python scripts/hires_profile.py [--nx 64] [--iters 2]

Writes results/hires_mg/profile_nx{N}.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fused_profile import parse_trace  # noqa: E402  (scripts/ sibling)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ocean_jax.config import OCPConfig
    from ocean_jax import system as sys_mod

    cfg = OCPConfig(ud_experiment="400_buoys",
                    unit_square_resolution=args.nx,
                    use_line_search=False, num_steps=args.iters,
                    linear_solver="mg")
    t0 = time.time()
    prob = sys_mod.build_problem(cfg)
    print(f"built Nx={args.nx} ndof={prob.space.ndof} "
          f"({time.time() - t0:.1f}s)", flush=True)
    f = sys_mod.initial_control(prob, case=4)
    progs = sys_mod.make_staged_pair(prob)   # the production staged path

    state = {}

    def one_iter(f_ctrl):
        fwd = state.get("fwd")
        if fwd is None:
            fwd, _ = progs.begin(f_ctrl.quad)
        z, g, gradj, div_u, adj_ok = progs.grad(f_ctrl, fwd)
        f_new, fwd_new, j_dev = progs.probe(f_ctrl, g, args.lr)
        j = float(progs.record(fwd.u_values, f_new.quad))
        state["fwd"] = fwd_new
        return f_new, j, fwd

    t0 = time.time()
    f, j, fwd = one_iter(f)            # compile + warm-up
    assert np.isfinite(j) and bool(fwd.newton.converged)
    compile_s = time.time() - t0
    print(f"warm-up iteration (incl. compile): {compile_s:.1f}s "
          f"J={j:.6e}", flush=True)

    trace_dir = f"/tmp/ocean_hires_profile_nx{args.nx}"
    walls = []
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.iters):
        t0 = time.time()
        f, j, fwd = one_iter(f)
        walls.append(time.time() - t0)
    jax.profiler.stop_trace()
    print(f"traced {args.iters} iterations, wall median "
          f"{float(np.median(walls)):.2f}s", flush=True)

    buckets, kernels, total, procs, path = parse_trace(trace_dir)
    n = args.iters
    top = sorted(kernels.items(), key=lambda kv: -kv[1][0])[:25]
    out = {
        "nx": args.nx,
        "ndof": prob.space.ndof,
        "wall_seconds_per_iteration": float(np.median(walls)),
        "warmup_seconds_incl_compile": compile_s,
        "traced_iterations": n,
        "device_self_seconds_per_iteration": total / n,
        "stage_buckets": {
            k: {"seconds": v[0] / n,
                **({"model_tflop_per_s":
                    round(v[1] / max(v[0], 1e-12) / 1e12, 4)}
                   if v[1] > 0 else {})}
            for k, v in sorted(buckets.items(), key=lambda kv: -kv[1][0])},
        "top_ops_by_self_time": [
            {"name": k, "source": v[2].replace("/root/repo/", ""),
             "seconds": v[0] / n} for k, v in top],
        "trace_file": path,
    }
    os.makedirs("results/hires_mg", exist_ok=True)
    dst = f"results/hires_mg/profile_nx{args.nx}.json"
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out["stage_buckets"], indent=2))
    print(f"written {dst}")


if __name__ == "__main__":
    main()
