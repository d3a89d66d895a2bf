"""Run the SHARDED training step on real TPU hardware.

The multi-chip path is correctness-proven on the virtual 8-device CPU mesh
(tests/test_sharding.py: bit-parity with the fused single-device step) and
dryrun-compiled by the driver; this probe closes the remaining gap — the
sharded ``make_sharded_step`` program executing on an actual chip, at the
flagship benchmark shape, timed against the plain ``system.gd_step`` it
wraps. With one real v5e the buoy mesh has a single shard, so shard_map's
collectives are degenerate (psum over one device) — what this measures is
the cost of the shard_map program structure itself on hardware, i.e. that
the multi-chip path pays ~nothing over the fused single-chip fast path and
would scale along the buoy axis.

Writes results/bench_stages/sharded_hw.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from bench import _build, _sync
    from ocean_jax import system as sys_mod
    from ocean_jax.parallel import make_buoy_mesh, make_sharded_step

    print("backend:", jax.default_backend(), flush=True)
    cfg, prob, f, lr = _build()
    mesh = make_buoy_mesh(jax.devices()[:1])
    step = make_sharded_step(prob, mesh, use_line_search=False)

    # reference: the fused single-device step at the same config.
    # prob as a jit ARGUMENT (a closed-over problem pytree becomes HLO
    # constants and trips the remote-compile helper's request-size cap)
    def fused_once(p, f_ctrl, lr_):
        res = sys_mod.gd_step(p, f_ctrl, lr_, use_line_search=False)
        return res.f_new, res.J, res.diverged

    fused_j = jax.jit(fused_once)
    fused = lambda f_ctrl, lr_: fused_j(prob, f_ctrl, lr_)

    def time_n(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            _sync(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), ts

    # warm up (compile)
    t0 = time.perf_counter()
    fq, fp2, lr_s, j_s, esc, div_s = step(f.quad, f.p2, lr)
    _sync((fq, j_s))
    compile_sharded = time.perf_counter() - t0
    t0 = time.perf_counter()
    f_new, j_f, div_f = fused(f, lr)
    _sync((f_new.quad, j_f))
    compile_fused = time.perf_counter() - t0

    assert np.isfinite(float(j_s)) and not bool(div_s)
    dj = abs(float(j_s) - float(j_f)) / max(abs(float(j_f)), 1e-30)
    dq = float(jnp.max(jnp.abs(fq - f_new.quad)))
    print(f"J sharded={float(j_s):.15e} fused={float(j_f):.15e} "
          f"rel drift={dj:.3e} control drift={dq:.3e}", flush=True)

    t_sharded, ts_s = time_n(lambda: step(f.quad, f.p2, lr)[:4])
    t_fused, ts_f = time_n(lambda: fused(f, lr)[:2])
    out = {
        "config": {"K": 10000, "nx": cfg.unit_square_resolution,
                   "ode_backend": "pallas", "psrc_method": "ozaki",
                   "dense_apply": "inverse", "devices": 1},
        "sharded_seconds": t_sharded, "fused_seconds": t_fused,
        "sharded_over_fused": t_sharded / t_fused,
        "compile_seconds": {"sharded": compile_sharded,
                            "fused": compile_fused},
        "j_rel_drift": dj, "control_drift": dq,
        "samples": {"sharded": ts_s, "fused": ts_f},
    }
    path = "results/bench_stages/sharded_hw.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"sharded {t_sharded:.3f} s vs fused {t_fused:.3f} s "
          f"({t_sharded / t_fused:.3f}x) → {path}", flush=True)


if __name__ == "__main__":
    main()
