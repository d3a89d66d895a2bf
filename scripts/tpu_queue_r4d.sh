#!/bin/bash
# Round-4 TPU queue, part d.
#
# 1. Resume nx96 ν=0.01 (r4a part 2 may time out mid-run: its it=0 line
#    search pays ~12 min per flatlined big-LR probe; the runner now
#    fail-fasts stalled rungs, so resumed probes cost ~2 min). The
#    state file resumes at the last accepted iteration.
# 2. Fused point-source kernel hardware parity + timing on ALL domain
#    classes (square / L-shape / graded pipe at K=10⁴ / obstacle hole) —
#    the round-4 kernel generalization is CPU-interpret-tested only;
#    this validates the Mosaic lowering (VERDICT r3 item 5).
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r4d.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
# skip the resume when r4a already finished all 5 iterations
NEED96=$(python - <<'EOF'
import json
try:
    with open("results/hires_mg/summary.json") as f:
        r = json.load(f)["runs"].get("nx96_nu0.01", {})
    print(0 if len(r.get("J", [])) >= 5 else 1)
except Exception:
    print(1)
EOF
)
if [ "$NEED96" = "1" ]; then
  run 10800 python -u scripts/hires_mg_run.py --resolutions 96 \
      --viscosity 0.01 --staged --line-search --skip-crosscheck --iters 5 \
      --newton-continuation 6 --adj-max-rounds 8 \
      --newton-max-iter 90 --mg-leaf-budget 6000 --log-newton-steps
fi
run 3600 python -u scripts/psrc_domains_hw.py
echo "=== queue r4d done $(date -u) ===" | tee -a "$LOG"
