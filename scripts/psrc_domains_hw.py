"""Hardware verification of the FUSED point-source kernel on every
domain class (square, L-shape, graded pipe, obstacle/hole pipe).

The round-4 generalization (`adjoint/pallas_psrc.py` — shared in-kernel
ds-exact searchsorted location with the primal-ODE kernel) is covered by
CPU tests in interpret mode (tests/test_psrc_fused.py), which validates
semantics but NOT the Mosaic lowering. This script compiles the kernel
on the real chip, records parity vs the f64 scatter path (the
reference-exact anchor: the `dolfin.PointSource` loop of
OCP_dolfin.py:353-366), and times fused vs scatter at production scale
(K=10⁴, nt=200 — the flagship limits configuration) on the graded
domain, closing VERDICT r3 missing item 2 ("fallback cost unmeasured")
the strong way: the fast path now *runs* there.

Writes results/bench_stages/psrc_domains_hw.json.
Run: python scripts/psrc_domains_hw.py   (needs the TPU)
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

from ocean_jax.mesh import rectangle_mesh, l_shape_mesh   # noqa: E402
from ocean_jax.mesh import structured                      # noqa: E402
from ocean_jax.fem import make_space                       # noqa: E402
from ocean_jax.fem.interpolate import eval_velocity, interpolate_p2  # noqa: E402
from ocean_jax.adjoint import point_source_rhs             # noqa: E402
from ocean_jax.ode.grideval import make_grideval           # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "bench_stages")


def inputs(space, rng, K, nt, h, lo, hi, center):
    u = interpolate_p2(space, lambda c: np.stack(
        [0.3 * np.sin(c[:, 1]), -0.3 * np.cos(c[:, 0])], axis=1))
    x = jnp.asarray(lo + (hi - lo) * rng.random((K, nt, 2)))
    mask = np.zeros(K, dtype=bool)
    mask[:: max(K // 7, 1)] = True        # a few masked (escaped) buoys
    x = jnp.where(jnp.asarray(mask)[:, None, None], center, x)
    u_values, inside = eval_velocity(space, u, x)
    assert bool(inside[~jnp.asarray(mask)].all())
    mu = jnp.asarray(rng.standard_normal((K, nt, 2)))
    u_d = jnp.asarray(rng.standard_normal((K, nt, 2)))
    return u, x, u_values, mu, u_d, jnp.asarray(mask)


def probe(name, space, K=512, nt=200, h=0.005, lo=0.5, hi=1.8,
          center=(1.0, 1.0), time_scatter=False):
    grid = make_grideval(space)
    rng = np.random.default_rng(23)
    center = jnp.asarray(center)
    u, x, uv, mu, u_d, mask = inputs(space, rng, K, nt, h, lo, hi, center)

    b_ref = point_source_rhs(space, u, x, mu, u_d, mask, h, center,
                             method="scatter")
    b_ref = jax.block_until_ready(b_ref)

    def fused():
        return point_source_rhs(space, u, x, mu, u_d, mask, h, center,
                                method="fused", grid=grid, u_values=uv)

    t0 = time.time()
    b_fused = np.asarray(fused())          # host transfer = real sync
    compile_s = time.time() - t0
    t0 = time.time()
    b_fused = np.asarray(fused())
    fused_s = time.time() - t0

    scale = float(jnp.abs(b_ref).max())
    err = float(np.abs(b_fused - np.asarray(b_ref)).max())
    rec = {"K": K, "nt": nt, "abs_err": err, "scale": scale,
           "rel_err": err / max(scale, 1e-30),
           "fused_seconds": fused_s, "compile_seconds": compile_s}
    if time_scatter:
        np.asarray(point_source_rhs(space, u, x, mu, u_d, mask, h,
                                    center, method="scatter"))
        t0 = time.time()
        np.asarray(point_source_rhs(space, u, x, mu, u_d, mask, h,
                                    center, method="scatter"))
        rec["scatter_seconds"] = time.time() - t0
    print(f"{name}: rel_err={rec['rel_err']:.3e} fused={fused_s:.4f}s"
          + (f" scatter={rec.get('scatter_seconds', 0):.4f}s"
             if time_scatter else ""), flush=True)
    assert err < 1e-9 * max(scale, 1.0), (name, err, scale)
    return rec


def main():
    results = {"backend": jax.default_backend(), "runs": {}}
    results["runs"]["square"] = probe(
        "square", make_space(rectangle_mesh((0.0, 0.0), (2.0, 2.0),
                                            32, 32)),
        lo=0.2, hi=1.8)
    sp_l = make_space(l_shape_mesh(24))
    xmin, ymin, xmax, ymax = (float(v) for v in sp_l.locator.extent)
    results["runs"]["l_shape"] = probe(
        "l_shape", sp_l, lo=xmin + 0.05,
        hi=xmin + 0.05 + 0.4 * (xmax - xmin),
        center=(xmin + 0.25 * (xmax - xmin),
                ymin + 0.25 * (ymax - ymin)))
    mesh_g, _ = structured.pipe_mesh(obstacle=False, graded=True,
                                     lc_min=0.08, lc_max=0.3)
    # production scale on the graded domain: the gen-1 pipe capability
    # (old_dolfinx_files/mesh_init.py:95-194) at the flagship K
    results["runs"]["graded_10k"] = probe(
        "graded_10k", make_space(mesh_g), K=10_000, time_scatter=True)
    mesh_h, _ = structured.pipe_mesh(resolution=16, obstacle=True)
    results["runs"]["hole"] = probe("hole", make_space(mesh_h))

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "psrc_domains_hw.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("written psrc_domains_hw.json", flush=True)


if __name__ == "__main__":
    main()
