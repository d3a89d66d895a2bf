"""Honest per-kernel attribution of the fused K=10⁴ GD iteration.

The isolated-stage table (`bench.py --stages`) times each stage as its own
XLA program, which runs DIFFERENT backends than the fused step (e.g. the
isolated adjoint ODE is the f64 gather chain while the fused program uses
the Pallas eval kernel) — its sum says nothing about where the fused
1.x s/iteration goes. This script captures a ``jax.profiler`` device trace
of the actual fused ``system.gd_step`` program (the benchmark
configuration from ``bench._build()`` — currently K=10⁴, Nx=32, pallas
ODE backend, ozaki point sources, explicit-inverse dense applies,
LU-reuse Newton, transposed-LU adjoint) and aggregates per-kernel device
times into named stage buckets, with achieved-FLOP/s and MFU estimates
for the compute-bound entries.

Writes ``results/bench_stages/fused_profile.json``. Run on the real TPU:

    python scripts/fused_profile.py

Reference timing-window parity: the traced program spans exactly the
reference's outer-loop window (``/root/reference/OCP_dolfin.py:313-375``).
"""

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e (TPU v5 lite) peaks per chip
PEAK_BF16_TFLOPS = 394.0
PEAK_F32_TFLOPS = 98.0   # ~peak f32 MXU rate on v5e


def capture_trace(trace_dir: str) -> float:
    """Run the fused benchmark step under the profiler; return the
    wall-clock median seconds per iteration (same methodology as
    bench.py)."""
    import jax
    from bench import _build, _sync, _timeit
    from ocean_jax import system as sys_mod

    cfg, prob, f, lr = _build()

    def one_step(f_ctrl):
        return sys_mod.gd_step(prob, f_ctrl, lr, use_line_search=False)

    res = one_step(f)
    assert np.isfinite(float(res.J)) and not bool(res.diverged)
    wall = _timeit(lambda fc: one_step(fc).J, f)

    jax.profiler.start_trace(trace_dir)
    for _ in range(2):
        _sync(one_step(f).J)
    jax.profiler.stop_trace()
    return wall


# source-path → stage label. The TPU trace annotates every HLO op with
# the jax-level source location (``args.source``) — the honest attribution
# axis: first match on the repo-relative path wins.
SOURCE_BUCKETS = [
    (r"ode/pallas_ode\.py", "pallas_primal_ode_kernel"),
    (r"ode/pallas_adjoint\.py", "pallas_adjoint_ode_kernel"),
    (r"ode/pallas_eval\.py", "pallas_adjoint_eval_kernel"),
    (r"ode/grideval\.py", "grideval_tables"),
    (r"ops/linalg\.py", "lu_triangular_solves_refinement"),
    (r"adjoint/point_sources\.py|ops/scatter\.py|ops/psum_pallas\.py"
     r"|adjoint/pallas_psrc\.py", "point_source_reduction"),
    (r"ops/stencil\.py", "linear_solve_glue"),
    (r"mesh/locate\.py", "point_location"),
    (r"fem/forms\.py", "operator_assembly"),
    (r"ode/", "ode_xla"),
    (r"fem/assemble\.py", "operator_assembly"),
    (r"fem/interpolate\.py|fem/project\.py", "projection_interpolation"),
    (r"solve/newton\.py", "newton_loop_glue"),
    (r"solve/", "linear_solve_glue"),
    (r"system\.py", "cost_update_glue"),
]


def _bucket_of(source: str, category: str) -> str:
    src = source.replace("/root/repo/", "").replace("ocean_jax/", "")
    for pat, label in SOURCE_BUCKETS:
        if re.search(pat, src):
            return label
    if src:
        return f"other:{src.split(':')[0]}"
    return f"unattributed:{category}"


def parse_trace(trace_dir: str):
    """Aggregate per-op SELF device times from the TensorBoard trace into
    source-attributed stage buckets.

    Only the device "XLA Ops" track is read (the "XLA Modules" track holds
    one whole-program container event — counting it would double every
    kernel). Ops nest (while loops contain their bodies), so each event's
    self time = duration − time of events strictly inside it; summed self
    times then tile the device timeline exactly once. ``model_flops`` from
    the trace gives achieved FLOP/s per bucket."""
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])

    proc_names, thread_names = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            proc_names[e.get("pid")] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            thread_names[(e.get("pid"), e.get("tid"))] = (
                e.get("args", {}).get("name", ""))
    dev_pids = {pid for pid, n in proc_names.items()
                if re.search(r"TPU|/device", n, re.I)
                and not re.search(r"host", n, re.I)}
    ops_tracks = {k for k, n in thread_names.items()
                  if k[0] in dev_pids and n == "XLA Ops"}

    ops = [e for e in events
           if e.get("ph") == "X" and (e.get("pid"), e.get("tid"))
           in ops_tracks and float(e.get("dur", 0.0)) > 0]
    # self time via nesting sweep: parents fully contain children on the
    # flame-graph track
    ops.sort(key=lambda e: (float(e["ts"]), -float(e["dur"])))
    stack = []          # (end_ts, index) of open containers
    child_time = [0.0] * len(ops)
    for i, e in enumerate(ops):
        ts, dur = float(e["ts"]), float(e["dur"])
        while stack and stack[-1][0] <= ts + 1e-9:
            stack.pop()
        if stack:
            child_time[stack[-1][1]] += dur
        stack.append((ts + dur, i))

    buckets = defaultdict(lambda: [0.0, 0.0])      # label → [self_s, flops]
    kernels = defaultdict(lambda: [0.0, 0.0, ""])  # name → [self_s, flops, src]
    total = 0.0
    for i, e in enumerate(ops):
        self_s = (float(e["dur"]) - child_time[i]) * 1e-6
        if self_s <= 0:
            continue
        a = e.get("args", {})
        src = a.get("source", "")
        # flops only for leaves (a while's model_flops double-counts its
        # body ops, which are already attributed individually)
        flops = (float(a.get("model_flops", 0) or 0)
                 if child_time[i] == 0 else 0.0)
        label = _bucket_of(src, a.get("hlo_category", "?"))
        buckets[label][0] += self_s
        buckets[label][1] += flops
        k = kernels[e.get("name", "?")]
        k[0] += self_s
        k[1] += flops
        k[2] = src
        total += self_s
    return dict(buckets), dict(kernels), total, proc_names, path


def main():
    trace_dir = os.environ.get("FUSED_PROFILE_DIR",
                               "/tmp/ocean_fused_profile")
    os.makedirs(trace_dir, exist_ok=True)
    if "--parse-only" in sys.argv:
        wall = json.load(open("results/bench_stages/fused_profile.json"))[
            "wall_seconds_per_iteration"] if os.path.exists(
                "results/bench_stages/fused_profile.json") else float("nan")
    else:
        wall = capture_trace(trace_dir)
    buckets, kernels, total, procs, path = parse_trace(trace_dir)
    n_traced = 2

    def entry(self_s, flops):
        e = {"seconds": self_s / n_traced}
        if flops > 0:
            tflops = flops / n_traced / (self_s / n_traced) / 1e12
            e["model_tflop_per_s"] = round(tflops, 4)
            e["mfu_vs_f32_peak"] = round(tflops / PEAK_F32_TFLOPS, 5)
        return e

    top = sorted(kernels.items(), key=lambda kv: -kv[1][0])[:25]
    out = {
        "wall_seconds_per_iteration": wall,
        "traced_iterations": n_traced,
        "device_self_seconds_per_iteration": total / n_traced,
        "stage_buckets": {
            k: entry(v[0], v[1]) for k, v in
            sorted(buckets.items(), key=lambda kv: -kv[1][0])},
        "top_ops_by_self_time": [
            dict(name=k, source=v[2].replace("/root/repo/", ""),
                 **entry(v[0], v[1])) for k, v in top],
        "trace_file": path,
        "note": ("SELF device times (nesting-deduplicated) of the XLA Ops "
                 "track of the REAL fused gd_step program, attributed by "
                 "the per-op jax source location — not isolated stage "
                 "programs; wall − device = host dispatch/transfer. "
                 "model_flops from the trace; MFU vs the ~98 TFLOP/s v5e "
                 "f32 MXU peak."),
    }
    os.makedirs("results/bench_stages", exist_ok=True)
    with open("results/bench_stages/fused_profile.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
