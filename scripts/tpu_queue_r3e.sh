#!/bin/bash
# Round-3 TPU queue, part e — hires runs on the host-driven stepped
# Newton (every device program = ONE Newton step; the r3b/r3d crashes
# were all minutes-long single begin/probe programs).
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r3e.log
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
echo "=== queue done $(date -u) ===" | tee -a "$LOG"
