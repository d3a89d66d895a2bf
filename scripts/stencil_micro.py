"""Stencil-vs-scatter matvec microbenchmark + correctness probe on TPU.

Isolates the offset-stencil operator application (ops/stencil.py) from the
full solver stack: builds the Nx∈{32,64,96} NS Jacobian, times
  * element scatter matvec (solve/mg.py::op_matvec, f32),
  * stencil matvec (coefficient build excluded / included),
and checks both against the exact f64 scatter matvec.

Run: python scripts/stencil_micro.py [--nx 64]
Writes results/bench_stages/stencil_micro.json (appends per nx).
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
    ap.add_argument("--nx", type=int, nargs="*", default=[32, 64])
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ocean_jax.mesh import structured
    from ocean_jax.mesh.structured import mark_boundary_facets
    from ocean_jax.fem import assemble
    from ocean_jax.fem.spaces import (make_space, make_boundary_quad,
                                      dirichlet_velocity_bc)
    from ocean_jax.ops import stencil
    from ocean_jax.solve import mg as mg_mod

    eps = 1e-12
    out_path = "results/bench_stages/stencil_micro.json"
    hist = []
    if os.path.exists(out_path):
        with open(out_path) as fh:
            hist = json.load(fh)

    def sync(v):
        np.asarray(v)
        return v

    def timeit(fn, *a):
        sync(fn(*a))
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            sync(fn(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    for nx in args.nx:
        mesh = structured.unit_square_mesh(nx)
        space = make_space(mesh)
        ftags = mark_boundary_facets(
            mesh, lambda x: (np.abs(x[:, 0]) < eps)
            | (np.abs(x[:, 0] - 1) < eps))
        bq = make_boundary_quad(mesh, ftags, tag=1)
        bc_dofs, _ = dirichlet_velocity_bc(mesh, space,
                                           lambda x: x[:, 1] < eps)
        rng = np.random.default_rng(0)
        w = jnp.asarray(0.3 * rng.standard_normal(space.ndof))
        op = sync(jax.jit(lambda ww: assemble.ns_operator(
            space, bq, ww, 1.0, bc_dofs))(w))
        st = stencil.build_stencil_tables(space, bq, "mixed")
        x = jnp.asarray(rng.standard_normal(space.ndof))

        mv_scatter = jax.jit(lambda o, v: mg_mod.op_matvec(o, jnp.float32)(v))
        mv64 = jax.jit(lambda o, v: o.matvec64(v))
        coef = jax.jit(lambda o: stencil.build_coefficients(st, o,
                                                            jnp.float32))
        mv_stencil = jax.jit(
            lambda s, v: stencil.stencil_matvec(st, s, op.bc_dofs, v))

        s = sync(coef(op))
        y_ref = np.asarray(sync(mv64(op, x)))
        y_st = np.asarray(sync(mv_stencil(s, x.astype(jnp.float32))))
        y_sc = np.asarray(sync(mv_scatter(op, x.astype(jnp.float32))))
        scale = np.abs(y_ref).max()
        err_st = float(np.abs(y_st - y_ref).max() / scale)
        err_sc = float(np.abs(y_sc - y_ref).max() / scale)

        row = {
            "backend": jax.default_backend(), "nx": nx,
            "ndof": space.ndof, "n_off": st.n_off,
            "scatter_f32_s": timeit(mv_scatter, op, x.astype(jnp.float32)),
            "stencil_f32_s": timeit(mv_stencil, s, x.astype(jnp.float32)),
            "coef_build_s": timeit(coef, op),
            "matvec64_scatter_s": timeit(mv64, op, x),
            "rel_err_stencil_f32": err_st,
            "rel_err_scatter_f32": err_sc,
        }
        print(json.dumps(row), flush=True)
        hist.append(row)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(hist, fh, indent=2)
    print("written", out_path, flush=True)


if __name__ == "__main__":
    main()
