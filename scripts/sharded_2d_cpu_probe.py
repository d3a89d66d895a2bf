"""2-D ("dof", "buoy") sharding perf-shape probe above toy size.

VERDICT r3 item 6: the dof-sharded FGMRES path had no evidence above
Nx=24, where cell sharding is all overhead. This probe runs on the
virtual 8-device CPU mesh (the build environment's stand-in for
multi-chip hardware — wall-clock on virtual devices SERIALIZES shard
work, so absolute times overstate a real mesh; the informative outputs
are (a) numerics invariance across layouts, (b) the sharded-vs-unsharded
matvec overhead ratio, whose communication term is what ICI would pay):

  * Nx=48, K=64 full GD steps: unsharded / 1-D (8 buoy) / 2-D (4 dof x
    2 buoy) — J must agree to 1e-9 across layouts,
  * operator-matvec micros at Nx=48 and Nx=64: exact f64 and Krylov-f32
    applications, unsharded vs cell-sharded over an 8-device "dof" axis
    (the only stage the dof axis changes).

Writes results/bench_stages/sharded_2d_cpu.json. Run (CPU):
    python scripts/sharded_2d_cpu_probe.py [--nx 48] [--iters 2]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def _t(fn, *args, reps=2):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])   # warm-up
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.time() - t0)
    return float(np.median(ts))


def matvec_micros(nx: int):
    """Unsharded vs 8-way cell-sharded operator application."""
    from jax.sharding import Mesh
    from ocean_jax.mesh import rectangle_mesh, mark_boundary_facets
    from ocean_jax.fem import (make_space, make_boundary_quad,
                               dirichlet_velocity_bc, assemble)
    from ocean_jax.parallel.dof_sharding import make_sharded_matvec

    _EPS = 1e-12
    mesh = rectangle_mesh((0.0, 0.0), (2.0, 2.0), nx, nx)
    space = make_space(mesh)
    g1 = lambda x: ((np.abs(x[:, 0]) < _EPS)
                    | (np.abs(2.0 - x[:, 0]) < _EPS))
    g2 = lambda x: ((x[:, 0] > _EPS) & (np.abs(2.0 - x[:, 0]) > _EPS))
    tags = mark_boundary_facets(mesh, g1, tag=1)
    bq = make_boundary_quad(mesh, tags, tag=1)
    bc_dofs, _ = dirichlet_velocity_bc(mesh, space, g2)
    rng = np.random.default_rng(0)
    w = jnp.asarray(0.1 * rng.standard_normal(space.ndof))
    op = assemble.ns_operator(space, bq, w, 1.0, bc_dofs)
    x64 = jnp.asarray(rng.standard_normal(space.ndof))
    x32 = x64.astype(jnp.float32)

    dev_mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("dof", "buoy"))
    mv_sh = make_sharded_matvec(op, dev_mesh)
    un64 = jax.jit(op.matvec64)
    sh = jax.jit(mv_sh)
    out = {
        "ndof": space.ndof, "num_cells": int(space.num_cells),
        "unsharded_f64_s": _t(un64, x64),
        "sharded8_f64_s": _t(sh, x64),
        "sharded8_f32_s": _t(sh, x32),
    }
    # parity: cell partitioning only reorders the scatter-add reduction
    d = float(jnp.max(jnp.abs(un64(x64) - mv_sh(x64))))
    scale = float(jnp.max(jnp.abs(un64(x64))))
    out["f64_matvec_drift"] = d / max(scale, 1.0)
    assert out["f64_matvec_drift"] < 1e-12, out
    return out


def gd_layouts(nx: int, iters: int):
    """Full GD steps at Nx with three device layouts; J parity across."""
    import dataclasses
    from ocean_jax.config import OCPConfig
    from ocean_jax import system as sys_mod
    from ocean_jax.parallel import (make_buoy_mesh, make_2d_mesh,
                                    make_sharded_step, make_sharded_step_2d)

    K = 64
    cfg = OCPConfig(unit_square_resolution=nx, ud_experiment=f"{K}_buoys",
                    T=0.25, dt=0.005, use_line_search=False,
                    linear_solver="mg")
    rng = np.random.default_rng(5)
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    x0 = 0.3 + 1.4 * rng.random((K, 2))
    prob = sys_mod.build_problem(cfg, u_d=u_d, x0=x0)
    f = sys_mod.initial_control(prob, case=4)
    lr = jnp.asarray(1.0)

    res = {}

    def drive(tag, step):
        jax.clear_caches()               # XLA:CPU compile-history fragility
        t0 = time.time()
        fq, fp, lr_, j, mc, div = step(f.quad, f.p2, lr)
        j0 = float(j)
        compile_s = time.time() - t0
        assert not bool(div), tag
        ts = []
        for _ in range(iters):
            t0 = time.time()
            out = step(f.quad, f.p2, lr)
            jv = float(out[3])
            ts.append(time.time() - t0)
        res[tag] = {"J": j0, "seconds_per_iter": ts,
                    "compile_seconds": compile_s}
        return j0

    def unsharded(fq, fp, lr_):
        from ocean_jax.control import Control
        r = sys_mod.gd_step(prob, Control(fq, fp), lr_,
                            use_line_search=False)
        return (r.f_new.quad, r.f_new.p2, r.lr, r.J,
                jnp.sum(r.fwd.mask), r.diverged)

    j_un = drive("unsharded", unsharded)
    j_1d = drive("buoy8_1d", make_sharded_step(prob, make_buoy_mesh()))
    j_2d = drive("dof4_buoy2_2d",
                 make_sharded_step_2d(prob, make_2d_mesh(4, 2)))
    for tag, j in (("buoy8_1d", j_1d), ("dof4_buoy2_2d", j_2d)):
        rel = abs(j - j_un) / abs(j_un)
        res[tag]["rel_J_vs_unsharded"] = rel
        assert rel < 1e-9, (tag, j, j_un)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--skip-gd", action="store_true")
    args = ap.parse_args()

    out = {"devices": jax.device_count(), "backend": jax.default_backend(),
           "note": ("virtual 8-device CPU mesh: shard work serializes, "
                    "so sharded wall-times overstate a real ICI mesh; "
                    "evidence = layout-invariant numerics + matvec "
                    "overhead structure")}
    out["matvec_micro"] = {str(nx): matvec_micros(nx) for nx in (48, 64)}
    print(json.dumps(out["matvec_micro"], indent=2), flush=True)
    if not args.skip_gd:
        out["gd_layouts_nx%d" % args.nx] = gd_layouts(args.nx, args.iters)
    os.makedirs("results/bench_stages", exist_ok=True)
    with open("results/bench_stages/sharded_2d_cpu.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
