"""Soak evidence for flipping ``reuse_ls_forward`` on by default.

``reuse_ls_forward=True`` reuses the accepted Armijo probe's forward state
as the next iteration's forward state — the updated control equals the
probed control exactly and the solve is deterministic, so results are
bit-identical while one full NS+ODE solve per iteration disappears
(the reference always re-solves: ``OCP_dolfin.py:313-315`` after the
line-search accept at ``:386-415``).

Runs the two production configurations (flagship K=10⁴ square, L-shape
resolution 50) with the flag off and on, asserts bit-identical J
trajectories / controls / LR schedules, and records the per-iteration
timing gain. Run on the TPU:

    python scripts/reuse_soak.py [--iters 10]

Writes results/reuse_soak/soak.json.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "results/reuse_soak"


def run_one(cfg, prob, f0, reuse, tag):
    from ocean_jax.opt.driver import run_gradient_descent
    t0 = time.time()
    res = run_gradient_descent(cfg, prob, f0, reuse_ls_forward=reuse,
                               verbose=False)
    wall = time.time() - t0
    print(f"{tag} reuse={reuse}: {res.iterations_run} its "
          f"J {res.j_array[0]:.6e} -> {res.j_array[-1]:.6e} "
          f"wall {wall:.1f}s", flush=True)
    return res, wall


def soak(cfg, build_kwargs, tag, iters):
    import jax.numpy as jnp
    from ocean_jax import system as sys_mod

    cfg = dataclasses.replace(cfg, num_steps=iters)
    prob = sys_mod.build_problem(cfg, **build_kwargs)
    f0 = sys_mod.initial_control(
        prob, case=4 if tag == "flagship_10k" else 0)

    res_off, wall_off = run_one(cfg, prob, f0, False, tag)
    res_on, wall_on = run_one(cfg, prob, f0, True, tag)

    assert res_off.j_array == res_on.j_array, (
        tag, res_off.j_array, res_on.j_array)
    assert res_off.divs_u == res_on.divs_u
    assert float(jnp.max(jnp.abs(res_off.f.quad - res_on.f.quad))) == 0.0
    assert res_off.lr == res_on.lr
    assert res_off.inner_iterations == res_on.inner_iterations
    # timing (drop iteration 0: compile)
    t_off = [a + b for a, b in zip(res_off.outer_times,
                                   res_off.inner_times)][1:]
    t_on = [a + b for a, b in zip(res_on.outer_times,
                                  res_on.inner_times)][1:]
    out = {
        "iterations": res_on.iterations_run,
        "J": res_on.j_array,
        "bit_identical": True,
        "seconds_per_iter_off": float(np.median(t_off)),
        "seconds_per_iter_on": float(np.median(t_on)),
        "speedup": float(np.median(t_off) / np.median(t_on)),
        "inner_iterations": res_on.inner_iterations,
    }
    print(f"{tag}: bit-identical; {out['seconds_per_iter_off']:.3f}s -> "
          f"{out['seconds_per_iter_on']:.3f}s per iter "
          f"({out['speedup']:.2f}x)", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-lshape", action="store_true")
    args = ap.parse_args()

    import jax
    from ocean_jax.config import OCPConfig
    from ocean_jax.pipelines.limits import ensure_ud

    print(f"backend: {jax.default_backend()}", flush=True)
    summary = {"backend": jax.default_backend(), "runs": {}}

    # flagship: K=10⁴ square Nx=32, Armijo on, the bench fast paths
    cfg = OCPConfig(ud_experiment="10000_buoys", unit_square_resolution=32,
                    use_line_search=True, ode_backend="pallas")
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "ud")
    u_d, x0 = ensure_ud(cfg, cache_dir=cache)
    summary["runs"]["flagship_10k"] = soak(
        cfg, dict(u_d=u_d, x0=x0), "flagship_10k", args.iters)

    if not args.skip_lshape:
        cfg_l = OCPConfig(L_shape=True, L_shape_resolution=50,
                          ud_experiment="3_buoys", use_line_search=True,
                          LR=5.0)
        summary["runs"]["lshape_res50"] = soak(
            cfg_l, {}, "lshape_res50", args.iters)

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "soak.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print("written results/reuse_soak/soak.json")


if __name__ == "__main__":
    main()
