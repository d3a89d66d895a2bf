#!/bin/bash
# Round-3 TPU follow-up queue — the items the first queue could not finish:
#   1. Nx=64 nu=0.01 probe   — retry (first attempt hit the known worker
#                              crash, BACKLOG platform fact 3)
#   2. Nx=192 3-level run    — was OOMing in the dense P1 mass projector;
#                              unblocked by the matrix-free CG projector
#   3. Nx=256 4-level probe  — same OOM, same fix
#   4. psrc_micro            — remaining fused-kernel cells (resume-safe;
#                              first pass timed out after the 4 base cells)
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r3b.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run 7200 python -u scripts/hires_mg_run.py --resolutions 64 \
    --viscosity 0.01 --staged --line-search --skip-crosscheck --iters 6 \
    --newton-continuation 6
run 14400 python -u scripts/hires_mg_run.py --resolutions 192 \
    --staged --line-search --skip-crosscheck --iters 6
run 14400 python -u scripts/hires_mg_run.py --resolutions 256 \
    --staged --line-search --skip-crosscheck --iters 3
run 5400 python -u scripts/psrc_micro.py
echo "=== queue done $(date -u) ===" | tee -a "$LOG"
