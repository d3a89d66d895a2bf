"""Pre-build an mg leaf inverse into data/mg_cache/ on the CPU.

The explicit f32 leaf inverse is a PRECONDITIONER component (coarse
correction of the V-cycle, solve/mg.py) — solution accuracy always comes
from the exact-f64 outer refinement — so it does not need to be built on
the TPU at all. Building it host-side removes the most worker-crash-prone
phase of a high-resolution TPU run (the ~40-program host-staged build
streams GBs through the remote tunnel, BACKLOG "platform facts") and lets
`build_mg_hierarchy` hit its disk cache (system.py).

Same construction as ops/linalg.py::explicit_inverse_host: f32 inverse +
one Newton–Schulz step X ← 2X − X(AX).

    python scripts/prebuild_leaf_inverse.py --n 48   # Nx=192's leaf
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48,
                    help="leaf grid resolution (48 = Nx=192's chain end)")
    ap.add_argument("--viscosity", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from ocean_jax.config import OCPConfig
    from ocean_jax import system as sys_mod

    cfg = OCPConfig(ud_experiment="400_buoys",
                    unit_square_resolution=4 * args.n,  # any cfg at ν
                    viscosity=args.viscosity)
    t0 = time.time()
    sp, bq, bc = sys_mod._make_mg_level(cfg, args.n)
    vel = sys_mod._stokes_velocity_operator(sp, bq, bc, cfg.viscosity)
    a = np.asarray(jax.jit(lambda o: o.dense())(vel)).astype(np.float32)
    n = a.shape[0]
    print(f"assembled n={n} dense velocity block ({time.time()-t0:.0f}s)",
          flush=True)

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "mg_cache",
        f"ainv_square_n{args.n}_nu{cfg.viscosity:g}_{n}.npy")
    if os.path.exists(cache):
        print(f"already cached: {cache}")
        return

    t0 = time.time()
    ainv = np.linalg.inv(a)
    print(f"f32 inverse ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    ainv = 2.0 * ainv - ainv @ (a @ ainv)      # Newton–Schulz polish
    resid = float(np.abs(a @ ainv - np.eye(n, dtype=np.float32)).max())
    print(f"Newton–Schulz step ({time.time()-t0:.0f}s), "
          f"‖AX − I‖∞ = {resid:.3e}", flush=True)

    os.makedirs(os.path.dirname(cache), exist_ok=True)
    tmp = cache + ".tmp"
    with open(tmp, "wb") as fh:
        np.save(fh, ainv)
    os.replace(tmp, cache)
    print(f"cached: {cache}")


if __name__ == "__main__":
    main()
