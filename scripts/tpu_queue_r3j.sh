#!/bin/bash
# Round-3 TPU queue, part j — nx64 nu=0.01 (VERDICT r2 item 9), take 3.
# r3h's config converged the stalling solve to rn=1.334e-8 in the 50-step
# cap (one decade short of rtol·r0). r3i added --mg-coarse-krylov 10 +
# --newton-refreeze 2 and made it WORSE: contraction per Newton step
# degraded from ~0.78 (r3h) to ~0.997 (observed at steps 6-46, rn pinned
# at ~3.8e-5; the slowdown coincided with the two refreeze events).
# So: r3h's exact flags with ONLY the cap raised 50→90 (plus step logging
# and deeper adjoint refinement, both inert for Newton convergence).
# Resume-safe: state_nx64_nu0.01.npz carries it=1's control/LR.
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r3j.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run 14400 python -u scripts/hires_mg_run.py --resolutions 64 \
    --viscosity 0.01 --staged --line-search --skip-crosscheck --iters 6 \
    --newton-continuation 6 --adj-max-rounds 6 \
    --newton-max-iter 90 --log-newton-steps
echo "=== queue r3j done $(date -u) ===" | tee -a "$LOG"
