"""Hardware verification of the Pallas ODE/eval kernels on the gen-1
pipe domains (graded tensor grids + obstacle holes) — the round-3-tail
generalization (`ode/pallas_ode.py::_make_graded_axis`, hole mask plane).

CPU tests run the kernels in interpret mode, which validates semantics
but NOT the Mosaic lowering (lane-broadcasts of grid-line columns, the
mask-plane dot_general). This script compiles them on the real chip and
records parity vs the f64 gather backend into
results/bench_stages/pallas_domains_hw.json.

Run: python scripts/pallas_domains_hw.py   (needs the TPU)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from ocean_jax.mesh import structured          # noqa: E402
from ocean_jax.fem.spaces import make_space    # noqa: E402
from ocean_jax.ode.grideval import (           # noqa: E402
    make_grideval, grad_to_grid, eval_p1_tensor_grid)
from ocean_jax.ode.primal import solve_primal_ode      # noqa: E402
from ocean_jax.ode.pallas_ode import solve_primal_ode_pallas  # noqa: E402
from ocean_jax.ode.pallas_eval import eval_p1_tensor_pallas   # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "bench_stages")


def probe(name, mesh):
    sp = make_space(mesh)
    ge = make_grideval(sp)
    rng = np.random.default_rng(7)
    u = jnp.asarray(0.6 * rng.standard_normal((sp.n_p2, 2)))
    K, nt, h = 512, 200, 0.005
    x0 = jnp.asarray(rng.uniform(0.05, 1.95, (K, 2)))
    center = jnp.asarray([1.0, 1.0])

    ref = solve_primal_ode(sp, u, x0, h, nt, center)
    t0 = time.time()
    pal = solve_primal_ode_pallas(sp, ge, u, x0, h, nt, center)
    jax.block_until_ready(pal.x)
    compile_s = time.time() - t0
    t0 = time.time()
    pal = solve_primal_ode_pallas(sp, ge, u, x0, h, nt, center)
    jax.block_until_ready(pal.x)
    run_s = time.time() - t0

    grad_u = jnp.asarray(rng.standard_normal((sp.n_p1, 2, 2)))
    g_img = grad_to_grid(ge, grad_u)
    pts = jnp.asarray(rng.uniform([0.0, 0.0], [2.0, 2.0], (4096, 2)))
    ev_ref, ins_ref = eval_p1_tensor_grid(ge, g_img, pts)
    ev, ins = eval_p1_tensor_pallas(ge, g_img, pts)
    sel = np.asarray(ins_ref)

    rec = {
        "mask_equal": bool(jnp.all(pal.mask == ref.mask)),
        "kfail_equal": bool(jnp.all(pal.kfail == ref.kfail)),
        "escapes": int(ref.mask.sum()),
        "max_abs_x_err": float(jnp.max(jnp.abs(pal.x - ref.x))),
        "max_abs_u_err": float(jnp.max(jnp.abs(pal.u_values
                                               - ref.u_values))),
        "eval_inside_equal": bool((ins == ins_ref).all()),
        "eval_max_abs_err": float(
            np.abs(np.asarray(ev_ref) - np.asarray(ev))[sel].max()),
        "primal_compile_s": compile_s,
        "primal_run_s": run_s,
    }
    ok = (rec["mask_equal"] and rec["kfail_equal"]
          and rec["eval_inside_equal"] and rec["max_abs_x_err"] < 1e-9
          and rec["max_abs_u_err"] < 1e-9
          and rec["eval_max_abs_err"] < 1e-11)
    rec["ok"] = ok
    print(f"{name}: ok={ok} escapes={rec['escapes']} "
          f"x_err={rec['max_abs_x_err']:.2e} "
          f"u_err={rec['max_abs_u_err']:.2e} "
          f"eval_err={rec['eval_max_abs_err']:.2e} "
          f"run={run_s:.3f}s")
    return rec


def main():
    assert jax.default_backend() == "tpu", "run on the TPU"
    results = {"backend": jax.default_backend(), "cases": {}}
    cases = {
        "pipe_hole_uniform": structured.pipe_mesh(resolution=22,
                                                  obstacle=True)[0],
        "pipe_graded": structured.pipe_mesh(obstacle=False, graded=True,
                                            lc_min=0.06, lc_max=0.2)[0],
        "pipe_hole_graded": structured.pipe_mesh(obstacle=True, graded=True,
                                                 lc_min=0.06,
                                                 lc_max=0.2)[0],
    }
    for name, mesh in cases.items():
        results["cases"][name] = probe(name, mesh)
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "pallas_domains_hw.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=2)
    print("written", path)
    assert all(c["ok"] for c in results["cases"].values())


if __name__ == "__main__":
    main()
