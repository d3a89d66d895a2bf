#!/bin/bash
# Round-3 TPU queue, part j — nx64 nu=0.01 (VERDICT r2 item 9), take 3.
# ATTRIBUTION (corrected): r3h already ran WITH --mg-coarse-krylov 10 and
# --adj-max-rounds 6 (results/tpu_queue_r3h.log line 1) and its final-rung
# Newton crawled at ~0.78/step to rn=1.334e-8 (one decade short at cap
# 50). r3i = r3h + --newton-refreeze 2: worse (~0.997/step, rn pinned at
# 3.8e-5) — the refreeze knob is implicated by that delta.
# This run, r3j = r3h MINUS --mg-coarse-krylov 10, PLUS cap 50→90 and
# step logging. Outcome (results/hires_mg/run.log): the final rung
# converged in 7 steps to rn=1.037e-11, implicating --mg-coarse-krylov
# as the Newton-side culprit; the run then asserted in the adjoint
# (rel res stall at 5.2e-6 — the ν-mis-scaled adjoint preconditioner,
# fixed in round 4 via nu_scale=1/ν).
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
