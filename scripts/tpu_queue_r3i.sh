#!/bin/bash
# Round-3 TPU queue, part i — the last open VERDICT r2 item (9):
# nx64 nu=0.01 staged run. r3h died at iteration 1: the accepted
# probe's cold-ladder target solve stalled linearly and ran out at
# rn=1.334e-8 with max_iter=50 (one decade short). Fixes in play:
#   * --newton-max-iter 90 (headroom for the ~0.4-decades/step tail)
#   * --newton-refreeze 2 (stall-triggered preconditioner re-freeze at
#     the current iterate; with --mg-coarse-krylov the inner Krylov
#     re-linearizes too)
#   * polish-step convergence crediting in run_newton_staged
# Resume-safe: state_nx64_nu0.01.npz holds it=1's control/LR.
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r3i.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run 14400 python -u scripts/hires_mg_run.py --resolutions 64 \
    --viscosity 0.01 --staged --line-search --skip-crosscheck --iters 6 \
    --newton-continuation 6 --mg-coarse-krylov 10 --adj-max-rounds 6 \
    --newton-max-iter 90 --newton-refreeze 2 --log-newton-steps
echo "=== queue r3i done $(date -u) ===" | tee -a "$LOG"
