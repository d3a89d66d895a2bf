#!/bin/bash
# Round-5 TPU queue, part c — the deep-hierarchy run to the conv-crit
# exit (VERDICT r4 item 7): Nx=192 (3-level V-cycle) with the reference
# convergence criterion |dJ| < 1e-3 after iteration 5
# (OCP_dolfin.py:444-446), recording the full J/timing/adjoint-round
# series. The n=48 leaf inverse is prebuilt into data/mg_cache (CPU,
# scripts/prebuild_leaf_inverse.py) so the build phase skips the
# crash-prone host-staged inverse streaming; the compile cache covers
# the rest. Bounded by the first argument (seconds, default 7200);
# state persists per accepted iteration, so a timeout loses nothing.
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r5c.log
BOUND="${1:-7200}"
echo "=== $(date -u +%H:%M:%S) nx192_conv bound=${BOUND}s ===" | tee -a "$LOG"
timeout "$BOUND" python -u scripts/hires_mg_run.py --resolutions 192 \
    --staged --line-search --skip-crosscheck --iters 40 \
    --conv-crit 0.001 --adj-max-rounds 8 --newton-max-iter 90 \
    --log-newton-steps >> "$LOG" 2>&1
echo "--- rc=$? ---" | tee -a "$LOG"
echo "=== queue r5c done $(date -u) ===" | tee -a "$LOG"
