#!/bin/bash
# Round-4 TPU queue, part d (time-aware ordering: the short psrc
# hardware probe first, the long nx96 resume with whatever time is
# left before the round closes).
#
# 1. Fused point-source kernel hardware parity + timing on ALL domain
#    classes (square / L-shape / graded pipe at K=10⁴ / obstacle hole) —
#    the round-4 kernel generalization is CPU-interpret-tested only;
#    this validates the Mosaic lowering (VERDICT r3 item 5).
# 2. Resume nx96 ν=0.01 (r4a part 2 timed out in its it=0 line search:
#    ~12 min per flatlined big-LR probe under the pre-fail-fast runner;
#    the runner now fail-fasts stalled rungs, so probes cost ~2 min).
#    The state file resumes at the last accepted iteration.
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r4d.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run 2400 python -u scripts/psrc_domains_hw.py
# grad-check closure at the golden viscosity (VERDICT r3 item 3): the
# 10_buoys golden config turned out to be an ESCAPE regime (6/10 escape
# at i=0), where the reference's own adjoint is inconsistent by
# construction — closure evidence = consistent-mode gradient landing on
# the FD limit there + decay-to-roundoff on the escape-free 2_buoys
# nu=0.01 cell.
run 2400 python -u scripts/gradcheck_closure.py
# refresh the committed per-K table under the new correction_iters=1
# default (headline + K=10 latency-floor cell)
run 2400 python -u bench.py --multi-k
# refreshed per-kernel attribution of the fused iteration under
# correction_iters=1 (VERDICT item 2 done-condition)
run 1500 python -u scripts/fused_profile.py
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
# bound the resume by the round close (the driver needs the chip for
# the final bench run; state persists per accepted iteration, so a
# timeout loses nothing)
REMAIN=$(( $(date -u -d "15:35" +%s) - $(date -u +%s) ))
if [ "$NEED96" = "1" ] && [ "$REMAIN" -gt 900 ]; then
  run "$REMAIN" python -u scripts/hires_mg_run.py --resolutions 96 \
      --viscosity 0.01 --staged --line-search --skip-crosscheck --iters 5 \
      --newton-continuation 6 --adj-max-rounds 8 \
      --newton-max-iter 90 --mg-leaf-budget 6000 --log-newton-steps
fi
echo "=== queue r4d done $(date -u) ===" | tee -a "$LOG"
