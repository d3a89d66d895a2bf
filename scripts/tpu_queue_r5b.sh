#!/bin/bash
# Round-5 TPU queue, part b — runs after the nx96 ν=0.01 window (r5a).
# Ordered by evidence value:
#  1. Fused adjoint-ODE kernel hardware parity + stage timing (the
#     round-5 ode_xla fix; VERDICT r4 weak item 1 / next item 2).
#  2. Headline + per-K refresh under the new kernel, including the
#     amortized multi-iteration small-K cells (next item 3).
#  3. Per-kernel attribution of the fused iteration (done-condition:
#     ode_xla bucket <= 0.06 s).
#  4. Flagship production refresh through the staged driver (item 4).
#  5. Grad-check closure regeneration fully on TPU (item 5).
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r5b.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run 3000 python -u scripts/adjoint_kernel_hw.py
run 1200 python -u bench.py
run 3600 python -u bench.py --multi-k
run 1800 python -u scripts/fused_profile.py
run 3600 python -u scripts/flagship_refresh.py --iters 30
run 3000 python -u scripts/gradcheck_closure.py
echo "=== queue r5b done $(date -u) ===" | tee -a "$LOG"
