#!/bin/bash
# Round-3 TPU queue, part d — reruns with the three fixes landed:
#   * cell-chunked assembly (Nx>=192 begin/grad programs no longer hold
#     15.75 GB of padded jacfwd temps)
#   * host-driven continuation rungs + warm probes (no more minutes-long
#     single-program bursts at Nx=64 nu=0.01 — the reproducible worker
#     crash)
#   * Mosaic-aligned ozaki_pallas kernel (hardware-verified exact)
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r3d.log
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
run 5400 python -u scripts/psrc_micro.py
run 3600 python -u scripts/fused_profile.py
run 3600 python -u scripts/sharded_hw_probe.py
echo "=== queue done $(date -u) ===" | tee -a "$LOG"
