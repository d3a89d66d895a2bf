#!/bin/bash
# Round-3 TPU queue, part g — closes the r3f failures:
#   1. nx256 staged run, --adj-max-rounds 12 (r3f: the staged adjoint's
#      default 4 fp64-refinement rounds were not enough at 4 levels;
#      per-round rel-res now logged so the contraction rate is recorded)
#   2. nx64 nu=0.01 rerun with --mg-coarse-krylov 10 (the convection-
#      aware coarse correction the r3f failure message asked for) —
#      resumes at it=1 from state_nx64_nu0.01.npz
#   3. mg_pre/post=1 A/B at Nx=64 (r3f hit a NameError since fixed)
#   4. bench multi-K refresh (r3f was killed mid-run)
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r3g.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run 14400 python -u scripts/hires_mg_run.py --resolutions 256 \
    --staged --line-search --skip-crosscheck --iters 3 \
    --adj-max-rounds 12
run 7200 python -u scripts/hires_mg_run.py --resolutions 64 \
    --viscosity 0.01 --staged --line-search --skip-crosscheck --iters 6 \
    --newton-continuation 6 --mg-coarse-krylov 10 --adj-max-rounds 6
run 5400 python -u scripts/hires_mg_run.py --resolutions 64 \
    --staged --line-search --skip-crosscheck --iters 3 \
    --mg-pre 1 --mg-post 1
run 3600 python -u bench.py --multi-k
echo "=== queue r3g done $(date -u) ===" | tee -a "$LOG"
