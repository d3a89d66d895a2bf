#!/bin/bash
# Round-3 TPU queue, part f — closes the r3e tail:
#   1. nx256 probe with the STAGED adjoint (the single fused grad program
#      crashed the worker at 592k dofs; run_adjoint_staged bounds every
#      device burst to one refinement round)
#   2. nx64 nu=0.01 rerun with the cold-ladder probe retry (resumes at
#      it=1 where the warm probe stalled at 3.6e-2)
#   3. mg_pre/post=1 A/B at Nx=64 (BACKLOG perf item 3)
#   4. fused-profile refresh (the committed profile predates the fused
#      point-source default: 0.667 s/iter vs today's 0.367)
#   5. headline + multi-K bench refresh
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r3f.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run 14400 python -u scripts/hires_mg_run.py --resolutions 256 \
    --staged --line-search --skip-crosscheck --iters 3
run 7200 python -u scripts/hires_mg_run.py --resolutions 64 \
    --viscosity 0.01 --staged --line-search --skip-crosscheck --iters 6 \
    --newton-continuation 6
run 5400 python -u scripts/hires_mg_run.py --resolutions 64 \
    --staged --line-search --skip-crosscheck --iters 3 \
    --mg-pre 1 --mg-post 1
run 3600 python -u scripts/fused_profile.py
run 3600 python -u bench.py
run 3600 python -u bench.py --multi-k
echo "=== queue r3f done $(date -u) ===" | tee -a "$LOG"
