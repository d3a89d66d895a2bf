#!/bin/bash
# Round-4 TPU queue, part a — close ν=0.01 at Nx≥64 (VERDICT r3 item 1).
#
# Root cause found in round 4: the reference's adjoint form carries a
# UNIT Laplacian (OCP_dolfin.py:344 — no ν coefficient) while the frozen
# mg hierarchy is assembled at ν, so at ν=0.01 the coarse correction was
# 100× too big and the Schur term 100× too small — exactly the r3j
# adjoint stall at rel res 5.2e-6. Fix: the adjoint mg solve passes
# nu_scale = 1/ν through the existing rung-scaling mechanism
# (solve/mg.py::solve_operator_mg, system.make_adjoint_stager). CPU
# reproduction at Nx=16: unscaled stalls at 2.5e-5, scaled converges to
# 2.3e-12 in half the inner iterations (tests/test_mg.py::
# test_mg_adjoint_low_viscosity_scaling).
#
# Part 1: nx64 ν=0.01 — resume the r3j state (it=0 accepted; the
# preconditioner change alters convergence only, not solutions).
# Part 2: nx96 ν=0.01 — same recipe; --mg-leaf-budget 6000 forces a
# 96→48→24 hierarchy so the fresh-ν leaf inverse builds in minutes
# (the default 20k budget would demand an hours-long 18.8k² host-staged
# build at a ν with no disk cache).
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=results/tpu_queue_r4a.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run 10800 python -u scripts/hires_mg_run.py --resolutions 64 \
    --viscosity 0.01 --staged --line-search --skip-crosscheck --iters 6 \
    --newton-continuation 6 --adj-max-rounds 8 \
    --newton-max-iter 90 --log-newton-steps
run 10800 python -u scripts/hires_mg_run.py --resolutions 96 \
    --viscosity 0.01 --staged --line-search --skip-crosscheck --iters 5 \
    --newton-continuation 6 --adj-max-rounds 8 \
    --newton-max-iter 90 --mg-leaf-budget 6000 --log-newton-steps
echo "=== queue r4a done $(date -u) ===" | tee -a "$LOG"
