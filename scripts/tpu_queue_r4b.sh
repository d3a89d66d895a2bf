#!/bin/bash
# Round-4 TPU queue, part b — verification + perf cells (VERDICT r3
# items 2 and 3).
#
# 1. Escape-free grad-check CLOSURE at the golden config (ν=0.01, Nx=32,
#    10 buoys — the reference's shipped 10_buoys run,
#    reference_runs/10_buoys/variables.txt): the committed
#    gradcheck_10_buoys tables document the reference's escape-regime
#    adjoint blindness; this run commits the complementary evidence —
#    the OCP_dolfin.py:268-295 decay-to-roundoff pattern on TPU when no
#    buoy escapes. Reference-exact paths (no --fast) so the table
#    reflects the anchor pipeline.
# 2. correction_iters A/B on the reuse-LU chord Newton (BACKLOG Perf 1):
#    targets K=10⁴ ≤ 0.30 s/iter and K=100 ≤ 0.15 s/iter.
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r4b.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run 7200 python -u -m ocean_jax.pipelines.ocp --ud-experiment 10_buoys \
    --viscosity 0.01 --unit-square-resolution 32 --num-steps 3 \
    --newton-continuation 6 --grad-check \
    --out-dir results/gradcheck_golden_nu001/
run 7200 python -u scripts/correction_ab.py
echo "=== queue r4b done $(date -u) ===" | tee -a "$LOG"
