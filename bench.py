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
"""

import json
import os
import time

import numpy as np

BASELINE_SECONDS = 1500.0          # reference CPU, K=10^4 (BASELINE.md)
K_EXPERIMENT = "10000_buoys"


def main():
    import jax
    import jax.numpy as jnp
    from ocean_jax.config import OCPConfig
    from ocean_jax import system as sys_mod
    from ocean_jax.pipelines.limits import ensure_ud

    cfg = OCPConfig(ud_experiment=K_EXPERIMENT, unit_square_resolution=32,
                    use_line_search=False, num_steps=1)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "data", "ud")
    u_d, x0 = ensure_ud(cfg, cache_dir=cache)
    prob = sys_mod.build_problem(cfg, u_d=u_d, x0=x0)
    # TPU fast paths (all tested equal to the reference-exact paths):
    # one LU per Newton solve + corrected steps; sort+exact-prefix
    # point-source reduction (7x faster than XLA scatter at 2e6 points)
    import dataclasses
    prob = dataclasses.replace(prob, newton_reuse_lu=True,
                               psrc_method="sorted")
    f = sys_mod.initial_control(prob, case=4)
    lr = jnp.asarray(cfg.LR)

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
    times = []
    f_run = f
    for _ in range(iters):
        t0 = time.time()
        res = one_step(f_run, lr)
        j_it = float(res.J)        # host transfer = authoritative sync
        times.append(time.time() - t0)
        assert np.isfinite(j_it) and not bool(res.diverged), (
            f"non-finite benchmark iteration (J={j_it})")
        f_run = res.f_new
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
    main()
