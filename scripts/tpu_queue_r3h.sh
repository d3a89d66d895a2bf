#!/bin/bash
# Round-3 TPU queue, part h — finishes the r3g tail (killed when the
# driving session ended at ~00:30 UTC 2026-08-20):
#   1. nx64 nu=0.01 staged run — resumes at it=1 from
#      state_nx64_nu0.01.npz (r3g got through continuation rung 1 of
#      iteration 1 before the kill; fully resume-safe)
#   2. mg_pre/post=1 A/B at Nx=64 (r3g never reached it)
#   3. bench multi-K refresh (ditto)
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r3h.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run 10800 python -u scripts/hires_mg_run.py --resolutions 64 \
    --viscosity 0.01 --staged --line-search --skip-crosscheck --iters 6 \
    --newton-continuation 6 --mg-coarse-krylov 10 --adj-max-rounds 6
run 5400 python -u scripts/hires_mg_run.py --resolutions 64 \
    --staged --line-search --skip-crosscheck --iters 3 \
    --mg-pre 1 --mg-post 1
run 3600 python -u bench.py --multi-k
echo "=== queue r3h done $(date -u) ===" | tee -a "$LOG"
