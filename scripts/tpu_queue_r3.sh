#!/bin/bash
# Round-3 TPU work queue — run once the chip is reachable.
# Every step is bounded, logged, and crash-resume-safe (the hires runner
# checkpoints per iteration; the mg leaf-inverse build is disk-cached), so
# a mid-queue worker crash only costs the in-flight step. Order =
# decreasing (value / device-minute):
#   1. psrc_micro     — decides the psrc_method / dense_apply default flips
#   2. refine_probe   — validates refine_iters 6→4 on the full flagship step
#   3. stencil_micro  — records the stencil-vs-scatter matvec numbers on TPU
#   4. nu=0.01 probe  — VERDICT r2 item 9 (Nx=64 at the golden viscosity)
#   5. Nx=192 run     — VERDICT r2 item 1 done-criterion (3-level V-cycle)
#   6. bench.py       — refreshed headline number
cd "$(dirname "$0")/.." || exit 1
# Persistent XLA compile cache: the flagship fused-step compile is
# O(minutes) through the tunnel; with the cache a crash-resume repays
# none of it (verified on axon: 3.8 s -> 0.5 s cross-process).
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p results/bench_stages
LOG=results/tpu_queue_r3.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run 3600 python -u scripts/psrc_micro.py
run 2400 python -u scripts/refine_probe.py
run 1800 python -u scripts/stencil_micro.py --nx 32 64 96
#   4a. the reference's ACTUAL ν=0.01 envelope: the 10_buoys golden
#       config (Nx=32, dense path) end-to-end with the ν-continuation
#       ladder — vanilla Newton from w=0 diverges here on any
#       implementation of the reference's algorithm
run 7200 python -u -m ocean_jax.pipelines.ocp --ud-experiment 10_buoys \
    --viscosity 0.01 --unit-square-resolution 32 --num-steps 6 \
    --newton-continuation 6 --fast --out-dir results/golden_nu001/
#   4b. beyond-reference robustness probe: Nx=64 on the mg path — the
#       Stokes-coarse Jacobi V-cycle loses convection-dominated blocks at
#       cell-Péclet ≳ 10 (stall residual scales ∝ h: 0.18 at Nx=16,
#       5.8e-4 at Nx=32); Nx=64 sits at Pe≈3 — measure where it lands
run 7200 python -u scripts/hires_mg_run.py --resolutions 64 \
    --viscosity 0.01 --staged --line-search --skip-crosscheck --iters 6 \
    --newton-continuation 6
run 14400 python -u scripts/hires_mg_run.py --resolutions 192 \
    --staged --line-search --skip-crosscheck --iters 6
run 3600 python -u bench.py
run 3600 python -u bench.py --multi-k
#   7. Nx=256 probe — the 4-level hierarchy's leaf inverse (n=8450) is
#      already disk-cached from the Nx=64 study, so the build is cheap;
#      3 iterations demonstrate convergence at 592k dofs
run 14400 python -u scripts/hires_mg_run.py --resolutions 256 \
    --staged --line-search --skip-crosscheck --iters 3
echo "=== queue done $(date -u) ===" | tee -a "$LOG"
