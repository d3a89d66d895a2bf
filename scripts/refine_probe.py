"""refine_iters validation probe: 6 (default) vs 4 fp64 refinement sweeps.

The config note ("4 sweeps ≡ 12 at 1.6e-12") was measured on the linear
solve in isolation; this probes the FULL flagship GD iteration: J,
gradient, and control drift between refine_iters=6 and 4 (and 8 as the
truth anchor), plus per-iteration wall. Run on the TPU:

    python scripts/refine_probe.py

Writes results/bench_stages/refine_probe.json.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    import jax
    from ocean_jax.config import OCPConfig
    from ocean_jax import system as sys_mod
    from ocean_jax.pipelines.limits import ensure_ud

    cfg = OCPConfig(ud_experiment="10000_buoys", unit_square_resolution=32,
                    use_line_search=False, num_steps=1,
                    ode_backend="pallas")
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "ud")
    u_d, x0 = ensure_ud(cfg, cache_dir=cache)
    base = sys_mod.build_problem(cfg, u_d=u_d, x0=x0)
    base = dataclasses.replace(base, newton_reuse_lu=True,
                               psrc_method="sorted")
    f = sys_mod.initial_control(base, case=4)
    lr = jnp.asarray(cfg.LR)

    out = {"backend": jax.default_backend(), "runs": {}}
    results = {}
    for iters in (8, 6, 4):
        prob = dataclasses.replace(base, refine_iters=iters)
        res = sys_mod.gd_step(prob, f, lr, use_line_search=False)
        j = float(res.J)                     # sync
        ts = []
        for _ in range(3):
            t0 = time.time()
            res = sys_mod.gd_step(prob, f, lr, use_line_search=False)
            j = float(res.J)
            ts.append(time.time() - t0)
        results[iters] = res
        out["runs"][str(iters)] = {"J": j,
                                   "seconds": float(np.median(ts))}
        print(f"refine_iters={iters}: J={j:.12e} "
              f"t={out['runs'][str(iters)]['seconds']:.3f}s", flush=True)

    ref = results[8]
    for iters in (6, 4):
        r = results[iters]
        out["runs"][str(iters)]["rel_J_drift_vs_8"] = abs(
            float(r.J) - float(ref.J)) / abs(float(ref.J))
        out["runs"][str(iters)]["max_grad_drift_vs_8"] = float(
            jnp.max(jnp.abs(r.grad.quad - ref.grad.quad)))
        out["runs"][str(iters)]["max_control_drift_vs_8"] = float(
            jnp.max(jnp.abs(r.f_new.quad - ref.f_new.quad)))
        print(f"refine_iters={iters}: "
              f"{json.dumps({k: v for k, v in out['runs'][str(iters)].items() if 'drift' in k})}",
              flush=True)

    os.makedirs("results/bench_stages", exist_ok=True)
    with open("results/bench_stages/refine_probe.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("written results/bench_stages/refine_probe.json", flush=True)


if __name__ == "__main__":
    main()
