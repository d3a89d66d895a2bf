"""Per-stage wall-clock probe of the hi-res mg iteration (no profiler).

Separates device-program wall time per stage (forward Newton / adjoint
RHS+solve / update) from everything else, to tell tunnel-dispatch and
trace overheads apart from true device cost. Run on the TPU:

    python scripts/hires_time_probe.py [--nx 64] [--iters 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
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
    forward_fn, adjoint_fn = sys_mod.stage_fns(prob)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0])
        return x

    rows = []
    for i in range(args.iters + 1):          # first = compile/warm-up
        t = {}
        t0 = time.time()
        fwd = sync(forward_fn(prob, f.quad))
        t["forward"] = time.time() - t0
        t0 = time.time()
        z = sync(adjoint_fn(prob, fwd))
        t["adjoint"] = time.time() - t0
        t0 = time.time()
        g = sys_mod.reduced_gradient(prob, f, z)
        f = f.axpy(-args.lr, g)
        j = float(sys_mod.cost(prob, fwd.u_values, f.quad))
        t["update_cost"] = time.time() - t0
        t["newton_its"] = int(fwd.newton.iterations)
        t["J"] = j
        print(f"it={i} {json.dumps({k: round(v, 3) if isinstance(v, float) else v for k, v in t.items()})}",
              flush=True)
        if i > 0:
            rows.append(t)

    med = {k: float(np.median([r[k] for r in rows]))
           for k in ("forward", "adjoint", "update_cost")}
    print("medians:", json.dumps(med), flush=True)


if __name__ == "__main__":
    main()
