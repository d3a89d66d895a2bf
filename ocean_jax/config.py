"""Configuration layer.

Mirrors the reference's two-tier config system (SURVEY §5.6):
``parameters.json`` holds physics/discretization constants
(reference ``parameters.json:1-7``, read at ``OCP_dolfin.py:63-69``),
and per-pipeline experiment knobs (reference ``OCP_dolfin.py:20-48``).

Key semantics preserved:
* buoy count ``K`` is parsed from the ``ud_experiment`` string
  (``OCP_dolfin.py:71-73``),
* the Tikhonov weight is rescaled by buoy count: ``alpha = alpha * K``
  (``OCP_dolfin.py:76``),
* the number of ODE time steps is ``int(T / dt)`` while the plotting
  time grid is ``linspace(t0, T, int(T/dt))`` — spacing T/(N-1), NOT dt
  (``OCP_dolfin.py:163,212``). Both are reproduced.
"""

from __future__ import annotations

import dataclasses
import json
import re


def load_parameters(path: str = "parameters.json") -> dict:
    """Load the physics/discretization constants JSON (same keys as the
    reference: viscosity, t0, T, dt, alpha)."""
    with open(path, "r") as fh:
        return json.load(fh)


@dataclasses.dataclass
class OCPConfig:
    """All knobs of the reference pipelines, with identical semantics.

    Defaults correspond to ``OCP_dolfin.py:20-48`` + ``parameters.json``.
    """

    # --- physics / discretization (parameters.json) ---
    viscosity: float = 1.0
    t0: float = 0.0
    T: float = 1.0
    dt: float = 0.005
    alpha: float = 1e-6          # rescaled by K via alpha_scaled

    # --- experiment setup (top-of-file constants) ---
    experiment: int = 1
    ud_experiment: str = "2_buoys"
    num_steps: int = 50
    out_dir: str = "results/ocean_jax/OCP/experiments/1/"
    L_shape: bool = False
    L_shape_resolution: int = 50
    unit_square_resolution: int = 32
    grad_check: bool = False
    # line search (OCP_dolfin.py:34-43)
    use_line_search: bool = True
    tau: float = 0.5
    c_armijo: float = 1e-4
    LR_MIN: float = 1e-6
    LR_MAX: float = 5.0
    LR: float = 5.0
    conv_crit: float = 1e-3
    # warm start / checkpoint (OCP_dolfin.py:46-48)
    load_q: bool = False
    load_string: str = ""
    checkpoints: bool = False

    # --- framework-only knobs (no reference counterpart) ---
    reference_runs_dir: str = "/root/reference/reference_runs"
    mesh_diagonal: str = "right"      # dolfin RectangleMesh default
    newton_rtol: float = 1e-9         # dolfin NewtonSolver defaults
    newton_atol: float = 1e-10
    newton_max_iter: int = 50
    max_line_search_iters: int = 80   # safety bound (reference loops forever)
    refine_iters: int = 6             # fp64 refinement sweeps per linear solve (TPU-validated: 4 sweeps ≡ 12 at 1.6e-12)
    newton_reuse_lu: bool = False     # one LU per Newton solve + corrected steps
    newton_correction_iters: int = 1  # Richardson correction sweeps per chord-Newton step on the reuse-LU path (hardware A/B results/bench_stages/correction_ab.json: 1 sweep keeps Newton at 3 iterations with ~1e-13 control drift and is 7-19% faster per GD iteration than the previous default 3)
    newton_chord_f32: bool = False  # run chord-correction sweeps in native f32 (TPU f64 is emulated; step quality is Richardson-limited ~1e-3, so the f64 convergence test is unaffected)
    dense_apply: str = "lu"           # lu|inverse — float32 preconditioner application on the dense path: sequential triangular solves, or one chunked-trsm explicit inverse whose every apply is a single MXU matmul
    linear_solver: str = "auto"       # auto|dense|mg — mg = FGMRES + geometric two-grid (past the dense-LU cap)
    mg_matvec: str = "stencil"        # stencil|scatter — Krylov/smoother operator application: offset-stencil images (structured-grid fast path, ops/stencil.py) or element scatter-add
    newton_continuation: int = 0      # viscosity-continuation rungs for the forward Newton solve (0 = reference-exact vanilla Newton from w=0, which diverges below ν≈0.02). Keep per-rung ν-drops ≤2×: n ≥ log2(1/ν) − 1, e.g. 6 rungs for the ν=0.01 golden-run regime
    mg_pre: int = 2                   # V-cycle pre-smoothing Jacobi sweeps (per level)
    mg_post: int = 2                  # V-cycle post-smoothing Jacobi sweeps (per level)
    mg_coarse_krylov: int = 0         # >0: convection-aware coarse correction — the frozen Stokes coarse solve preconditions an FGMRES(k) on the coarse operator assembled at the linearization state (solve/mg.py). EXPERIMENTAL: the r3h/r3j hardware A/B at ν=0.01 Nx=64 showed it degrades Newton contraction (0.78/step crawl with it, 7-step convergence without); the ν≠1 adjoint is handled by the nu_scale=1/ν hierarchy scaling instead. 0 = off (ν=1 paths bit-identical)
    mg_leaf_budget: int = 0           # >0 overrides system.DENSE_INV_VEL_DOF_BUDGET: max velocity dofs of the multigrid leaf level (the only level holding an explicit dense inverse). Smaller budget = deeper hierarchy + cheaper leaf build (the host-staged inverse build is O(n³) through the remote tunnel — at the default 20k budget a fresh Nx=96 leaf costs hours; budget 6000 forces 96→48→24 and builds in minutes)
    adjoint_mode: str = "reference"   # reference|consistent — consistent keeps escaped buoys' pre-escape adjoint terms
    projector_solver: str = "auto"    # auto|dense|cg — ∇u L2-projection mass solves: factorized-once dense (below 20k P1 dofs) or matrix-free lumped-Jacobi CG (mesh-independent iteration count; the only option at Nx≥192 where the dense P1 mass no longer fits HBM)
    psrc_method: str = "scatter"      # point-source reduction: scatter|sorted|binned|ozaki|ozaki_pallas (exact bf16-MXU slicing; _pallas keeps the one-hot in VMEM)|fused (whole stage — location+basis+reduction — as one Pallas kernel, adjoint/pallas_psrc.py; every domain class — uniform square/L-shape, graded tensor meshes, hole domains — and both escape modes incl. the consistent-adjoint active_t window)
    ode_backend: str = "gather"       # primal-ODE point eval: gather (index tables) | grid (table-free half-grid stencil) | pallas (fused TPU mega-kernel, f64-equivalent double-single)
    adjoint_reuse_lu: str = "auto"    # auto|on|off — solve the adjoint through the TRANSPOSED Newton LU factors (no second factorization per GD iteration; auto = on iff ν==1, where the adjoint operator is exactly the transposed Jacobian, and the dense path is active)
    # Reuse the accepted Armijo probe's forward state as the next
    # iteration's forward state. Bit-identical (the updated control equals
    # the probed control exactly; solves are deterministic) while skipping
    # one NS+ODE solve per iteration; the reference always re-solves
    # (OCP_dolfin.py:313-315 after the line-search accept at :386-415), so
    # per-iteration outer/inner timing splits differ from the reference's
    # methodology when this is on (totals are what improve). Soak evidence:
    # results/reuse_soak/soak.json — flagship K=10⁴ 1.20×, L-shape res-50
    # 1.80× per iteration, J/control/LR trajectories exactly equal.
    reuse_ls_forward: bool = True
    # Drive the production GD loop through the consolidated staged
    # programs (system.make_staged_pair): one device program per stage
    # instead of eager per-op dispatch chains — ~29 ms/RTT on the
    # tunneled TPU made the eager loop 2.25 s/iter at K=10⁴ vs ~0.4 s
    # staged, identical (J, LR) trajectories. Requires (implies)
    # reuse_ls_forward; False → the legacy per-stage loop.
    staged_driver: bool = True
    seed: int = 0

    @property
    def K(self) -> int:
        """Buoy count parsed from the ud_experiment string
        (reference ``OCP_dolfin.py:71-73``)."""
        match = re.search(r"\d+", self.ud_experiment)
        if match is None:
            raise ValueError(f"no buoy count in {self.ud_experiment!r}")
        return int(match.group())

    @property
    def alpha_scaled(self) -> float:
        """alpha * K (reference ``OCP_dolfin.py:76``)."""
        return self.alpha * self.K

    @property
    def num_time_steps(self) -> int:
        """int(T / dt) — 200 for the shipped parameters
        (``OCP_dolfin.py:164``)."""
        return int(self.T / self.dt)

    def with_parameters(self, params: dict) -> "OCPConfig":
        """Return a copy updated from a parameters.json dict."""
        return dataclasses.replace(
            self,
            viscosity=params.get("viscosity", self.viscosity),
            t0=params.get("t0", self.t0),
            T=params.get("T", self.T),
            dt=params.get("dt", self.dt),
            alpha=params.get("alpha", self.alpha),
        )

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)
