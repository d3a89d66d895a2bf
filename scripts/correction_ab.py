"""A/B the reuse-LU chord step's correction sweeps (BACKLOG "Perf 1").

The fused-iteration profile (results/bench_stages/fused_profile.json)
puts 0.137 s of the 0.340 s device time in newton_loop_glue — the
elementwise residual/jvp/while-loop ops of solve/newton.py. Each chord
step currently does 1 + 3 correction sweeps (4 solve32 + 3 exact jvps);
fewer sweeps make each step ~2× cheaper but Newton needs more of them.
This measures the whole trade at the bench configuration and gates on
control parity (the convergence test is the exact fp64 residual either
way, so only iteration counts — not accuracy — may move).

Writes results/bench_stages/correction_ab.json. Run on the TPU:
    python scripts/correction_ab.py
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import bench  # noqa: E402  (repo-root bench harness: _build/_sync/_timeit)


def main():
    import jax
    from ocean_jax import system as sys_mod

    out = {"backend": jax.default_backend(), "runs": {}}
    for k_exp in ("10000_buoys", "100_buoys"):
        cfg, prob, f, lr = bench._build(k_exp)
        ref = None
        # (ci, chord_f32): f64 sweep count A/B, then the native-f32
        # chord sweeps (solve/newton.py residual_fn32 — the f64
        # convergence test is identical, so converged states agree to
        # ~the 1e-9·r0 stopping threshold, not to 1e-12)
        for ci, f32 in ((3, False), (2, False), (1, False),
                        (3, True), (1, True)):
            p = dataclasses.replace(prob, newton_correction_iters=ci,
                                    newton_chord_f32=f32)

            def step(fc):
                return sys_mod.gd_step(p, fc, lr, use_line_search=False)

            res = step(f)
            j = float(res.J)
            tag = f"{k_exp}_ci{ci}" + ("_f32" if f32 else "")
            assert not bool(res.diverged), tag
            t = bench._timeit(lambda fc: step(fc).J, f)
            fq = np.asarray(res.f_new.quad)
            nit = int(res.fwd.newton.iterations)
            rec = {"seconds": t, "newton_iterations": nit, "J": j}
            if ref is None:
                ref = (j, fq)
            else:
                dj = abs(j - ref[0]) / abs(ref[0])
                dfq = float(np.max(np.abs(fq - ref[1]))
                            / max(np.max(np.abs(ref[1])), 1e-30))
                rec["rel_J_drift_vs_ci3"] = dj
                rec["rel_control_drift_vs_ci3"] = dfq
                # f64 sweep-count cells: same-precision chord, tight
                # gate; f32 cells: converged states differ below the
                # stopping threshold — gate one decade looser
                if f32:
                    assert dj < 1e-9 and dfq < 1e-8, (tag, dj, dfq)
                else:
                    assert dj < 1e-10 and dfq < 1e-9, (tag, dj, dfq)
            out["runs"][tag] = rec
            print(json.dumps({k_exp: rec, "ci": ci, "f32": f32}),
                  flush=True)
    os.makedirs("results/bench_stages", exist_ok=True)
    with open("results/bench_stages/correction_ab.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("written results/bench_stages/correction_ab.json", flush=True)


if __name__ == "__main__":
    main()
