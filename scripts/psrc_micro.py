"""Hardware A/B for the round-3 fast-path candidates.

Measures the FULL flagship gd_step (K=10⁴, Nx=32, fused, line search off)
under the cross of:
  * psrc_method ∈ {sorted, ozaki}   — sort+exact-prefix segment sum vs the
    slice-decomposed bf16 MXU one-hot contraction (ops/scatter.py),
  * dense_apply ∈ {lu, inverse}     — sequential triangular solves vs the
    explicit f32 inverse whose applies are single MXU matmuls
    (ops/linalg.py::invert32),
asserting J/gradient/control parity (≤1e-10 relative) between all cells so
the winner can be flipped to default safely. Run on the TPU:

    python scripts/psrc_micro.py

Writes results/bench_stages/psrc_micro.json.
"""

import dataclasses
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ocean_jax.config import OCPConfig
    from ocean_jax import system as sys_mod
    from ocean_jax.pipelines.limits import ensure_ud

    cfg = OCPConfig(ud_experiment="10000_buoys", unit_square_resolution=32,
                    use_line_search=False, num_steps=1,
                    ode_backend="pallas", newton_reuse_lu=True)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "ud")
    u_d, x0 = ensure_ud(cfg, cache_dir=cache)

    # Crash-resume: the TPU worker can die mid-queue (BACKLOG platform
    # fact 3) — reload completed cells from the partial JSON + the ref
    # cell's arrays from the side npz and only run what's missing.
    json_path = "results/bench_stages/psrc_micro.json"
    npz_path = "results/bench_stages/psrc_micro_arrays.npz"
    out = {"backend": jax.default_backend(), "runs": {}}
    arrays = {}
    if os.path.exists(json_path):
        with open(json_path) as fh:
            prev = json.load(fh)
        out["runs"].update(prev.get("runs", {}))
        if os.path.exists(npz_path):
            arrays = dict(np.load(npz_path))
        print(f"resuming: {sorted(out['runs'])} already measured", flush=True)

    def _checkpoint():
        os.makedirs("results/bench_stages", exist_ok=True)
        with open(json_path, "w") as fh:
            json.dump(out, fh, indent=2)
        np.savez(npz_path, **arrays)

    results = {}
    cells = list(itertools.product(("sorted", "ozaki"), ("lu", "inverse")))
    cells.append(("ozaki_pallas", "inverse"))
    cells.append(("fused", "inverse"))
    cells.append(("fused", "lu"))
    for psrc, dense in cells:
        tag = f"{psrc}+{dense}"
        if tag in out["runs"] and f"{tag}:grad" in arrays:
            continue
        c = dataclasses.replace(cfg, psrc_method=psrc, dense_apply=dense)
        t0 = time.time()
        prob = sys_mod.build_problem(c, u_d=u_d, x0=x0)
        build_s = time.time() - t0
        f = sys_mod.initial_control(prob, case=4)
        lr = jnp.asarray(c.LR)
        res = sys_mod.gd_step(prob, f, lr, use_line_search=False)
        j = float(res.J)                      # sync; includes compile
        compile_s = time.time() - t0 - build_s
        ts = []
        for _ in range(4):
            t0 = time.time()
            res = sys_mod.gd_step(prob, f, lr, use_line_search=False)
            j = float(res.J)
            ts.append(time.time() - t0)
        assert not bool(res.diverged), tag
        results[tag] = res
        arrays[f"{tag}:grad"] = np.asarray(res.grad.quad)
        arrays[f"{tag}:control"] = np.asarray(res.f_new.quad)
        out["runs"][tag] = {"J": j, "seconds": float(np.median(ts)),
                            "build_seconds": build_s,
                            "compile_seconds": compile_s}
        print(f"{tag}: J={j:.12e} t={out['runs'][tag]['seconds']:.3f}s "
              f"(build {build_s:.0f}s compile {compile_s:.0f}s)", flush=True)
        _checkpoint()

    ref_tag = "sorted+lu"
    for tag in list(out["runs"]):
        if tag == ref_tag or f"{tag}:grad" not in arrays:
            continue
        out["runs"][tag]["rel_J_drift"] = abs(
            out["runs"][tag]["J"] - out["runs"][ref_tag]["J"]) / abs(
            out["runs"][ref_tag]["J"])
        out["runs"][tag]["max_grad_drift"] = float(np.max(np.abs(
            arrays[f"{tag}:grad"] - arrays[f"{ref_tag}:grad"])))
        out["runs"][tag]["max_control_drift"] = float(np.max(np.abs(
            arrays[f"{tag}:control"] - arrays[f"{ref_tag}:control"])))
        print(f"{tag}: drifts "
              f"{json.dumps({k: v for k, v in out['runs'][tag].items() if 'drift' in k})}",
              flush=True)

    _checkpoint()
    print(f"written {json_path}", flush=True)


if __name__ == "__main__":
    main()
