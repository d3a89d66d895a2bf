#!/bin/bash
# Round-3 TPU queue, part c — perf-evidence refresh at the new defaults:
#   1. fused_profile — the committed per-kernel attribution was captured at
#      the 1.39 s (sorted+lu) config; re-capture at the 0.66 s shipping
#      defaults (ozaki psrc + explicit-inverse applies)
#   2. sharded_hw_probe — the sharded training step executing on the real
#      chip at the flagship shape, timed against the fused step it wraps
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r3c.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run 3600 python -u scripts/fused_profile.py
run 3600 python -u scripts/sharded_hw_probe.py
echo "=== queue done $(date -u) ===" | tee -a "$LOG"
