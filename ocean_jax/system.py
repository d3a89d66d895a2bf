"""The coupled OCP system: problem container + jitted stage functions.

This is the TPU-native core of the framework — everything the reference's
gradient-descent iteration does (``OCP_dolfin.py:309-450``) expressed as
pure jittable functions over an `OCPProblem` pytree:

    solve_ns        primal Navier–Stokes Newton solve     (:314-325)
    forward         NS + ∇u projection + primal ODE       (:314-330)
    cost            J(u_values, f)                         (:258-261)
    solve_adjoint   adjoint ODE + point sources + adjoint NS (:331-371)
    reduced_gradient  αf − z on Γ₁                          (:379,388,426)
    gd_step         one full GD iteration including the Armijo line search
                    as a lax.while_loop                     (:384-429)

The whole GD iteration compiles to a single XLA program; host↔device
traffic happens only at checkpoint/plot boundaries (SURVEY §3.5).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import control as ctrl_mod
from .adjoint import point_source_rhs
from .config import OCPConfig
from .control import Control
from .fem import (assemble, make_space, make_boundary_quad,
                  dirichlet_velocity_bc)
from .fem.interpolate import boundary_eval_velocity
from .fem.spaces import TaylorHoodSpace, BoundaryQuad
from .mesh import rectangle_mesh, l_shape_mesh, mark_boundary_facets
from .ode import solve_primal_ode, solve_adjoint_ode
from .ode.grideval import make_grideval
from .solve import newton_solve, solve_operator, GradProjector
from .solve.linear import solve_operator_reuse_t
from .solve import mg as mg_mod
from .solve.mg import MGContext
from .solve.newton import NewtonResult

_EPS = 1e-12


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class OCPProblem:
    """All device tables + constants of one OCP experiment."""

    space: TaylorHoodSpace
    bq: BoundaryQuad                 # Γ₁ quadrature (the ds(1) measure)
    bc_dofs: jnp.ndarray             # homogeneous Dirichlet velocity dofs Γ₂
    bc_vals: jnp.ndarray
    projector: GradProjector         # cached P1 mass factorization
    u_d: jnp.ndarray                 # (K, nt, 2) measurements
    x0: jnp.ndarray                  # (K, 2) buoy seeds
    center: jnp.ndarray              # (2,) domain center (escape target)
    # static constants
    nu: float
    alpha: float                     # already rescaled by K (alpha * K)
    h: float                         # dt
    nt: int
    refine_iters: int = 6            # fp64 refinement sweeps per solve
    newton_reuse_lu: bool = False    # one LU per Newton solve + corrections
    psrc_method: str = "scatter"     # point-source reduction strategy
    # mesh-robust Krylov path past the dense-LU cap (solve/mg.py):
    mg: Optional[MGContext] = None   # two-grid transfer/coarse tables
    linear_solver: str = "dense"     # "dense" | "mg"
    mg_pre: int = 2                  # V-cycle pre-smoothing sweeps
    mg_post: int = 2                 # V-cycle post-smoothing sweeps
    # >0: convection-aware coarse correction — the frozen Stokes coarse
    # solve preconditions an inner FGMRES(k) on the coarse operator
    # assembled at the linearization state (solve/mg.py; needed at the
    # ν=0.01 golden viscosity for Nx≥64 where the Stokes coarse V-cycle
    # stalls warm-started Newton at ~3.6e-2)
    mg_coarse_krylov: int = 0
    newton_continuation: int = 0     # ν-ladder rungs (0 = vanilla Newton)
    # "reference" drops escaped buoys from the adjoint (OCP_dolfin.py:
    # 237-238,354-355); "consistent" keeps their pre-escape contributions
    # (gradient matches FD in escape regimes — beyond the reference)
    adjoint_mode: str = "reference"
    # primal-ODE point-eval backend (ode/grideval.py, ode/pallas_ode.py):
    # "gather" (locate/dofmap index tables), "grid" (table-free half-grid
    # stencil), "pallas" (fused 200-step TPU mega-kernel)
    ode_backend: str = "gather"
    grid: Optional[object] = None    # GridEval tables (grid/pallas backends)
    # solve the adjoint system through the TRANSPOSED Newton LU factors —
    # one factorization per GD iteration instead of two (valid because the
    # reference's adjoint operator is the transposed Jacobian at ν=1;
    # solve/linear.py::solve_operator_reuse_t)
    adjoint_reuse_lu: bool = False
    # per-buoy weights (K,): multi-chip padding lanes carry weight 0 —
    # they drop out of the cost, the adjoint point sources, and escape
    # counting (parallel/sharding.py::pad_buoys). None = all ones.
    buoy_weights: Optional[jnp.ndarray] = None
    # preconditioned-Richardson sweeps per chord-Newton step on the
    # reuse-LU fast path (solve/newton.py): each sweep costs one exact
    # jvp + one solve32. Hardware A/B (correction_ab.json): 1 sweep
    # keeps Newton at 3 iterations with ~1e-13 control drift and is
    # 7-19% faster per GD iteration than 3.
    newton_correction_iters: int = 1
    # run the chord-correction sweeps in native float32 (solve/newton.py
    # ``residual_fn32``): the polished step is Richardson-limited at
    # ~1e-3 relative, three decades above f32 roundoff, while TPU f64 is
    # software-emulated — the convergence test stays exact-f64 either
    # way. Off by default pending the hardware drift/timing A/B
    # (scripts/correction_ab.py).
    newton_chord_f32: bool = False
    # problem-constant float32 LU factors of the STOKES (w=0) Jacobian —
    # the matrix every Newton solve factorizes first is control-
    # independent, so it is factorized ONCE here and the GD iteration
    # (incl. every Armijo probe) runs with zero in-program factorizations
    # (solve/newton.py::newton_solve fac0)
    fac0: Optional[object] = None

    def tree_flatten(self):
        return ((self.space, self.bq, self.bc_dofs, self.bc_vals,
                 self.projector, self.u_d, self.x0, self.center, self.mg,
                 self.grid, self.buoy_weights, self.fac0),
                (self.nu, self.alpha, self.h, self.nt, self.refine_iters,
                 self.newton_reuse_lu, self.psrc_method, self.linear_solver,
                 self.adjoint_mode, self.ode_backend, self.adjoint_reuse_lu,
                 self.mg_pre, self.mg_post, self.newton_continuation,
                 self.mg_coarse_krylov, self.newton_correction_iters,
                 self.newton_chord_f32))

    @classmethod
    def tree_unflatten(cls, aux, children):
        *head, mg, grid, buoy_weights, fac0 = children
        (*scalars, linear_solver, adjoint_mode, ode_backend,
         adjoint_reuse_lu, mg_pre, mg_post, newton_continuation,
         mg_coarse_krylov, newton_correction_iters,
         newton_chord_f32) = aux
        return cls(*head, *scalars, mg=mg, linear_solver=linear_solver,
                   adjoint_mode=adjoint_mode, ode_backend=ode_backend,
                   grid=grid, adjoint_reuse_lu=adjoint_reuse_lu,
                   buoy_weights=buoy_weights, fac0=fac0,
                   mg_pre=mg_pre, mg_post=mg_post,
                   newton_continuation=newton_continuation,
                   mg_coarse_krylov=mg_coarse_krylov,
                   newton_correction_iters=newton_correction_iters,
                   newton_chord_f32=newton_chord_f32)

    @property
    def K(self) -> int:
        return self.u_d.shape[0]


class ForwardState(NamedTuple):
    w: jnp.ndarray             # mixed NS solution
    x: jnp.ndarray             # (K, nt, 2) trajectories
    u_values: jnp.ndarray      # (K, nt, 2)
    mask: jnp.ndarray          # (K,) escaped buoys
    newton: NewtonResult
    x_raw: jnp.ndarray         # (K, nt, 2) pre-escape positions
    kfail: jnp.ndarray         # (K,) first failing step (nt if none)


# ---------------------------------------------------------------------------
# problem construction (host-side, one-time)
# ---------------------------------------------------------------------------

def _domain_setup(cfg: OCPConfig, resolution: Optional[int] = None):
    """Mesh + domain center + boundary predicates for a resolution
    (defaults to the config's; overridable for the MG coarse grid)."""
    if cfg.L_shape:
        n = resolution or cfg.L_shape_resolution
        mesh = l_shape_mesh(n, diagonal=cfg.mesh_diagonal)
        center = np.array([1.0, 0.5])        # OCP_dolfin.py:81
        # Γ₁ = {x=0} ∪ {y=2}  (OCP_dolfin.py:118-121, L-shape branch)
        gamma1 = lambda x: ((np.abs(x[:, 0]) < _EPS)
                            | (np.abs(2.0 - x[:, 1]) < _EPS))
        # Γ₂ = rest (:131-133)
        gamma2 = lambda x: ((x[:, 0] > _EPS)
                            & (np.abs(2.0 - x[:, 1]) > _EPS))
    else:
        n = resolution or cfg.unit_square_resolution
        mesh = rectangle_mesh((0.0, 0.0), (2.0, 2.0), n, n,
                              diagonal=cfg.mesh_diagonal)
        center = np.array([1.0, 1.0])        # OCP_dolfin.py:98
        gamma1 = lambda x: ((np.abs(x[:, 0]) < _EPS)
                            | (np.abs(2.0 - x[:, 0]) < _EPS))
        gamma2 = lambda x: ((x[:, 0] > _EPS)
                            & (np.abs(2.0 - x[:, 0]) > _EPS))
    return mesh, center, gamma1, gamma2


# past this many mixed dofs, "auto" picks the two-grid Krylov path (the
# dense fp32 LU still compiles up to ~21k dofs with the raised scoped-VMEM
# limit; see LARGE_SOLVE_COMPILER_OPTIONS)
AUTO_MG_DOF_THRESHOLD = 25000


def resolve_adjoint_reuse(mode: str, nu: float, linear_solver: str) -> bool:
    """Resolve the ``adjoint_reuse_lu`` config knob. "auto" enables the
    transposed-factor adjoint solve exactly when it is mathematically a
    preconditioner of the right operator: ν=1 (the reference's adjoint
    Laplacian carries no viscosity coefficient, OCP_dolfin.py:344, so it
    transposes the Jacobian only at ν=1) on the dense direct path (the mg
    path holds no factors)."""
    if mode == "on":
        return True
    if mode == "off":
        return False
    if mode != "auto":
        raise ValueError(f"adjoint_reuse_lu must be auto|on|off, got {mode!r}")
    return nu == 1.0 and linear_solver == "dense"


# the coarsest multigrid level must fit an explicit dense f32 inverse:
# ~20k velocity dofs → a 1.6 GB inverse + a one-time O(n³) build. Levels
# above it are corrected recursively (solve/mg.py::_coarse_solver), so
# mesh resolution is unbounded — the axis the reference scales through
# PETSc's sparse CPU LU (OCP_dolfin.py:28-30,325,371).
DENSE_INV_VEL_DOF_BUDGET = 20000


def _make_mg_level(cfg: OCPConfig, n: int):
    mesh, _, g1, g2 = _domain_setup(cfg, resolution=n)
    space = make_space(mesh)
    tags = mark_boundary_facets(mesh, g1, tag=1)
    bq = make_boundary_quad(mesh, tags, tag=1)
    bc_dofs, _ = dirichlet_velocity_bc(mesh, space, g2)
    return space, bq, bc_dofs


def _stokes_velocity_operator(space, bq, bc_dofs, nu):
    """The FROZEN (w=0) NS velocity block at a level — the smoothing
    operator of intermediate multigrid levels (problem-constant: the
    whole preconditioner hierarchy is frozen at w0=0)."""
    op0 = jax.jit(lambda w: assemble.ns_operator(
        space, bq, w, nu, bc_dofs))(jnp.zeros(space.ndof))
    return mg_mod.velocity_block(op0, 2 * space.n_p2)


def build_mg_hierarchy(cfg: OCPConfig, space_f: TaylorHoodSpace,
                       bq_f: BoundaryQuad, bc_dofs_f: jnp.ndarray,
                       n_fine: int,
                       budget: Optional[int] = None) -> MGContext:
    """Build the multi-level geometric-multigrid context chain: halve the
    resolution until the coarsest velocity block fits the dense-inverse
    budget, freeze the Stokes velocity operator of every intermediate
    level, and precompute the explicit f32 inverse only at the leaf
    (memory-bounded host-staged programs, ops/linalg.py). Two-grid for
    Nx≤96 (unchanged round-2 behavior), three levels at Nx=192, four at
    Nx=256 — resolution is no longer capped by any dense factorization."""
    from .ops import linalg as _linalg
    if budget is None:
        budget = DENSE_INV_VEL_DOF_BUDGET
    levels = [(space_f, bq_f, bc_dofs_f)]
    n = n_fine
    while True:
        n = max(n // 2, 4)
        lvl = _make_mg_level(cfg, n)
        levels.append(lvl)
        if 2 * lvl[0].n_p2 <= budget or n <= 4:
            break

    # leaf inverse (explicit f32, host-staged build). Cached on disk: the
    # ~40-program host-staged build moves GBs through the remote-TPU
    # tunnel and is the build phase most exposed to worker crashes
    # (BACKLOG "platform facts"); a crashed run retried with the cache
    # skips straight past it. Key = (domain, leaf resolution, ν, n).
    space_l, bq_l, bc_l = levels[-1]
    domain = "lshape" if cfg.L_shape else "square"
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "mg_cache",
        f"ainv_{domain}_n{n}_nu{cfg.viscosity:g}_"
        f"{2 * space_l.n_p2}.npy")
    if os.path.exists(cache):
        ainv = jnp.asarray(np.load(cache))
        assert ainv.shape[0] == 2 * space_l.n_p2
    else:
        vel_l = _stokes_velocity_operator(space_l, bq_l, bc_l,
                                          cfg.viscosity)
        a_l = jax.jit(lambda o: o.dense())(vel_l)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        ainv = _linalg.explicit_inverse_host(
            a_l, progress_path=cache + ".progress")
        tmp = cache + ".tmp"
        with open(tmp, "wb") as fh:
            np.save(fh, np.asarray(ainv))
        os.replace(tmp, cache)
        if os.path.exists(cache + ".progress"):
            os.remove(cache + ".progress")

    sub = None
    for i in range(len(levels) - 2, -1, -1):
        (sp_f, bq_i, bc_i), (sp_c, bq_c, bc_c) = levels[i], levels[i + 1]
        top = i == 0
        ctx = mg_mod.build_mg_context(
            sp_f, sp_c, bq_c, bc_c, cfg.viscosity,
            bq_f=bq_i, bc_dofs_f=bc_i if top else None,
            use_stencil=(cfg.mg_matvec != "scatter"))
        if i == len(levels) - 2:
            ctx = dataclasses.replace(ctx, ainv_c=ainv)
        else:
            op_vel_c = _stokes_velocity_operator(sp_c, bq_c, bc_c,
                                                 cfg.viscosity)
            ctx = dataclasses.replace(ctx, sub=sub, op_vel_c=op_vel_c)
        sub = ctx
    return sub


def build_problem(cfg: OCPConfig,
                  u_d: Optional[np.ndarray] = None,
                  x0: Optional[np.ndarray] = None) -> OCPProblem:
    """Build the problem from a config, loading u_d/x0 from
    ``reference_runs/<ud_experiment>`` unless given (OCP_dolfin.py:162-196).
    """
    mesh, center, gamma1, gamma2 = _domain_setup(cfg)
    space = make_space(mesh)
    tags = mark_boundary_facets(mesh, gamma1, tag=1)
    bq = make_boundary_quad(mesh, tags, tag=1)
    bc_dofs, bc_vals = dirichlet_velocity_bc(mesh, space, gamma2)

    ode_backend = getattr(cfg, "ode_backend", "gather")
    linear_solver = getattr(cfg, "linear_solver", "auto")
    if linear_solver == "auto":
        linear_solver = ("mg" if space.ndof > AUTO_MG_DOF_THRESHOLD
                         else "dense")
    mg_ctx = None
    fac0 = None
    if linear_solver == "mg":
        n_fine = (cfg.L_shape_resolution if cfg.L_shape
                  else cfg.unit_square_resolution)
        budget = getattr(cfg, "mg_leaf_budget", 0) or None
        mg_ctx = build_mg_hierarchy(cfg, space, bq, bc_dofs, n_fine,
                                    budget=budget)
    else:
        # problem-constant Stokes LU: the first matrix every Newton solve
        # factorizes is J(w0=0) — control-independent — so factorize it
        # once here and the per-iteration programs do ZERO factorizations
        # (raised scoped-VMEM jit for large dense problems, ops/linalg.py).
        # dense_apply="inverse" builds the explicit f32 inverse instead:
        # every downstream solve32/solve32_t becomes one MXU matmul.
        from .ops import linalg as _linalg
        build = (_linalg.invert32
                 if getattr(cfg, "dense_apply", "lu") == "inverse"
                 else _linalg.factorize)
        fac0 = _linalg._maybe_large_lu_jit(
            lambda w: build(assemble.ns_operator(
                space, bq, w, cfg.viscosity, bc_dofs).dense()))(
                    jnp.zeros(space.ndof))
        if hasattr(fac0, "with_transpose"):
            # the adjoint solve applies these factors TRANSPOSED every
            # refinement sweep (solve/linear.py::solve_operator_reuse_t);
            # b @ ainv reduces over the major axis of the row-major
            # inverse — an order-of-magnitude-slower strided pass — so
            # materialize A⁻ᵀ once per problem (+n² f32)
            fac0 = fac0.with_transpose()

    nt = cfg.num_time_steps
    if u_d is None or x0 is None:
        if cfg.L_shape:
            u_d, x0 = lshape_ud(cfg)
        else:
            import os
            base = os.path.join(cfg.reference_runs_dir, cfg.ud_experiment)
            u_d = np.load(os.path.join(base, "u_d_array.npy"))
            x0 = np.load(os.path.join(base, "x_0_array.npy"))[:, 0, :]

    u_d = np.asarray(u_d)
    if u_d.shape[1] != nt:
        raise ValueError(
            f"u_d has {u_d.shape[1]} time samples but int(T/dt) = {nt}; "
            "the measurement data and the (T, dt) config must agree "
            "(reference_runs data was generated with T=1, dt=0.005)")
    return OCPProblem(
        space=space, bq=bq, bc_dofs=bc_dofs, bc_vals=bc_vals,
        projector=GradProjector.build(
            space, dense_apply=getattr(cfg, "dense_apply", "lu"),
            solver=getattr(cfg, "projector_solver", "auto")),
        u_d=jnp.asarray(u_d), x0=jnp.asarray(x0),
        center=jnp.asarray(center),
        nu=cfg.viscosity, alpha=cfg.alpha_scaled, h=cfg.dt, nt=nt,
        refine_iters=cfg.refine_iters,
        newton_reuse_lu=getattr(cfg, "newton_reuse_lu", False),
        newton_correction_iters=getattr(cfg, "newton_correction_iters", 1),
        newton_chord_f32=getattr(cfg, "newton_chord_f32", False),
        psrc_method=getattr(cfg, "psrc_method", "scatter"),
        mg=mg_ctx, linear_solver=linear_solver,
        mg_pre=getattr(cfg, "mg_pre", 2),
        mg_post=getattr(cfg, "mg_post", 2),
        mg_coarse_krylov=getattr(cfg, "mg_coarse_krylov", 0),
        newton_continuation=getattr(cfg, "newton_continuation", 0),
        adjoint_mode=getattr(cfg, "adjoint_mode", "reference"),
        ode_backend=ode_backend,
        # the fused point-source kernel locates against the half-grid
        # tables too, so "fused" forces them even on the gather backend
        grid=(make_grideval(space)
              if (ode_backend != "gather"
                  or getattr(cfg, "psrc_method", "scatter") == "fused")
              else None),
        adjoint_reuse_lu=resolve_adjoint_reuse(
            getattr(cfg, "adjoint_reuse_lu", "auto"), cfg.viscosity,
            linear_solver),
        fac0=fac0)


def lshape_ud(cfg: OCPConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Analytic L-shape measurements for 3 buoys (OCP_dolfin.py:168-196).
    Time grid quirk reproduced: u_d is sampled on linspace(t0, T, nt)
    whose spacing is T/(nt-1), while the ODE integrates with h=dt."""
    nt = cfg.num_time_steps
    t = np.linspace(cfg.t0, cfg.T, nt)
    ud1 = 0.5 * (np.cos(np.pi * (t - 0.5)) - 1 - np.cos(np.pi))
    u_d = np.zeros((3, nt, 2))
    u_d[0, :, 0] = ud1
    u_d[1, :, 0] = ud1
    u_d[1, :, 1] = ud1
    u_d[2, :, 1] = ud1
    x0 = np.array([[0.5, 0.5], [1.0, 0.5], [1.5, 1.0]])
    return u_d, x0


def initial_control(prob: OCPProblem, case: int = 0) -> Control:
    """The q₀ presets: case 0 is the OCP default
    (``OCP_dolfin.py:143-145``), cases 0-3 are the initial-control study
    (``initial_control_test.py:30-42``), case 4 the limits pipeline's
    constant (0.1, 0) (``Pipeline_limits.py:123``)."""
    def tg(x):
        return np.stack([-np.cos(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]),
                         np.sin(np.pi * x[:, 0]) * np.cos(np.pi * x[:, 1])],
                        axis=1)
    if case == 0:
        fn = tg
    elif case == 1:
        fn = lambda x: np.zeros((len(x), 2))
    elif case == 2:
        # component-swapped Taylor–Green (initial_control_test.py:37-39):
        # q₀ = (sin πx · cos πy, −cos πx · sin πy)
        fn = lambda x: np.stack(
            [np.sin(np.pi * x[:, 0]) * np.cos(np.pi * x[:, 1]),
             -np.cos(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])], axis=1)
    elif case == 3:
        fn = lambda x: np.full((len(x), 2), 0.1)
    elif case == 4:
        fn = lambda x: np.stack([np.full(len(x), 0.1),
                                 np.zeros(len(x))], axis=1)
    else:
        raise ValueError(f"unknown control case {case}")
    return ctrl_mod.from_expression(prob.space, prob.bq, fn)


def fd_direction(prob: OCPProblem) -> Control:
    """df = ('0.1', '0.1') (``OCP_dolfin.py:148``)."""
    return ctrl_mod.constant(prob.space, prob.bq, [0.1, 0.1])


# ---------------------------------------------------------------------------
# jitted stage functions
# ---------------------------------------------------------------------------

def _solve_ns(prob: OCPProblem, f_quad: jnp.ndarray,
              matvec_of=None, w_start=None) -> NewtonResult:
    """Primal NS Newton solve, from w=0 (``OCP_dolfin.py:314-325``).

    linear_solver="mg" swaps the dense-LU Newton steps for the mesh-robust
    FGMRES + multigrid preconditioner (solve/mg.py) — the scaling path past
    ~21k mixed dofs where the TPU dense LU no longer fits. ``matvec_of``
    (op → matvec) lets multi-chip callers dof-shard the Krylov matvec.

    ``w_start``: Newton initial guess. When given, the viscosity-
    continuation ladder is SKIPPED — the caller already has a state in the
    strong solution's basin (the staged runner's warm-started probes: the
    ladder is purely a basin-finding device; Newton's exact-f64
    convergence test fixes the accuracy of the result regardless of the
    start)."""
    def residual(w):
        return assemble.ns_residual(prob.space, prob.bq, w, f_quad, prob.nu)

    def operator(w):
        return assemble.ns_operator(prob.space, prob.bq, w, prob.nu,
                                    prob.bc_dofs)

    # --- viscosity continuation (newton_continuation > 0) ----------------
    # Vanilla Newton from w=0 — the reference's solve(F==0, w, bcs) with a
    # fresh Function each iteration (OCP_dolfin.py:315,325) — diverges at
    # the 10_buoys golden viscosity ν=0.01 (measured: residual 1.2 → 4e4
    # over 50 iterations at Nx∈{16,32}, any preset control). A geometric
    # ν-ladder from 1.0 down to ν, each rung warm-starting the next,
    # reaches the strong solution (|w|≈5.4) in a handful of Newton steps
    # per rung. Default 0 = reference-exact single solve. Pre-rungs run
    # the factorize-per-step Newton (dense) / state-frozen FGMRES Newton
    # (mg) at the rung viscosity; only the FINAL solve's exact-f64
    # convergence test touches accuracy, so the ladder is a pure
    # robustness device.
    warm = w_start is not None
    if not warm:
        w_start = jnp.zeros(prob.space.ndof)
    n_rungs = 0 if warm else getattr(prob, "newton_continuation", 0)

    if prob.linear_solver == "mg":
        ck = getattr(prob, "mg_coarse_krylov", 0)
        if ((prob.mg.ainv_c is not None or prob.mg.sub is not None)
                and ck == 0):
            # the coarse hierarchy is frozen/precomputed: no per-solve
            # coarse assembly (it was built and then ignored before)
            coarse_operator = None
        else:
            # legacy in-program coarse inverse, OR mg_coarse_krylov > 0:
            # the state-assembled coarse operator feeding the
            # convection-aware inner Krylov (solve/mg.py)
            def coarse_operator(w):
                w_c = mg_mod.inject_state(prob.mg, prob.space, w)
                return assemble.ns_operator(prob.mg.space_c, prob.mg.bq_c,
                                            w_c, prob.nu,
                                            prob.mg.bc_dofs_c)

        if n_rungs > 0 and prob.nu < 1.0:
            ratio = (prob.nu / 1.0) ** (1.0 / (n_rungs + 1))
            for k in range(n_rungs + 1):
                nu_k = ratio ** k
                res_k = mg_mod.newton_solve_mg(
                    lambda w, nu_k=nu_k: assemble.ns_residual(
                        prob.space, prob.bq, w, f_quad, nu_k),
                    lambda w, nu_k=nu_k: assemble.ns_operator(
                        prob.space, prob.bq, w, nu_k, prob.bc_dofs),
                    None if coarse_operator is None else
                    (lambda w, nu_k=nu_k: assemble.ns_operator(
                        prob.mg.space_c, prob.mg.bq_c,
                        mg_mod.inject_state(prob.mg, prob.space, w),
                        nu_k, prob.mg.bc_dofs_c)),
                    prob.mg, prob.space, w_start, prob.bc_dofs,
                    prob.bc_vals, matvec_of=matvec_of,
                    pre=prob.mg_pre, post=prob.mg_post,
                    nu_scale=nu_k / prob.nu, coarse_krylov=ck)
                w_start = res_k.w

        return mg_mod.newton_solve_mg(
            residual, operator, coarse_operator, prob.mg, prob.space,
            w_start, prob.bc_dofs, prob.bc_vals,
            matvec_of=matvec_of, pre=prob.mg_pre, post=prob.mg_post,
            coarse_krylov=ck)

    if n_rungs > 0 and prob.nu < 1.0:
        ratio = (prob.nu / 1.0) ** (1.0 / (n_rungs + 1))
        for k in range(n_rungs + 1):
            nu_k = ratio ** k                # 1.0·r^0 … down to ν·r⁻¹
            res_k = newton_solve(
                lambda w, nu_k=nu_k: assemble.ns_residual(
                    prob.space, prob.bq, w, f_quad, nu_k),
                lambda w, nu_k=nu_k: assemble.ns_operator(
                    prob.space, prob.bq, w, nu_k, prob.bc_dofs),
                w_start, prob.bc_dofs, prob.bc_vals)
            w_start = res_k.w

    if (n_rungs > 0 or warm) and prob.nu < 1.0:
        # continuation/warm start: the Stokes-frozen fac0 belongs to w=0
        # at the target ν — at the warm-started strong state its
        # stale-factor corrections can diverge; factorize J(w_start)
        return newton_solve(residual, operator, w_start,
                            prob.bc_dofs, prob.bc_vals)
    residual32 = None
    if getattr(prob, "newton_chord_f32", False) and prob.newton_reuse_lu:
        # float32 twins of the basis/geometry tables, cast in-program
        # (never close over the problem pytree — BACKLOG platform fact
        # 1); one pass over a few MB, amortized across the chord loop
        cast32 = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        space32, bq32 = cast32(prob.space), cast32(prob.bq)
        f_quad32 = f_quad.astype(jnp.float32)

        def residual32(w32):
            return assemble.ns_residual(space32, bq32, w32, f_quad32,
                                        prob.nu)

    return newton_solve(residual, operator, w_start,
                        prob.bc_dofs, prob.bc_vals,
                        reuse_factorization=prob.newton_reuse_lu,
                        correction_iters=getattr(
                            prob, "newton_correction_iters", 1),
                        fac0=prob.fac0, residual_fn32=residual32)


solve_ns = jax.jit(_solve_ns, static_argnames=("matvec_of",))


def _primal_ode(prob: OCPProblem, u: jnp.ndarray):
    """Primal buoy ODE on the configured ``ode_backend``: the index-table
    gather chain (reference-exact anchor), the table-free half-grid
    stencil, or the fused Pallas TPU kernel (one kernel for all nt-1 Euler
    steps; double-single f32 positions hold f64-equivalent accuracy).
    Factored out so the multi-chip path can shard_map exactly this stage
    over the buoy axis (parallel/sharding.py)."""
    if prob.ode_backend == "pallas":
        from .ode.pallas_ode import solve_primal_ode_pallas
        return solve_primal_ode_pallas(prob.space, prob.grid, u, prob.x0,
                                       prob.h, prob.nt, prob.center)
    return solve_primal_ode(prob.space, u, prob.x0, prob.h, prob.nt,
                            prob.center,
                            grid=(prob.grid if prob.ode_backend == "grid"
                                  else None))


def _forward(prob: OCPProblem, f_quad: jnp.ndarray, ode_impl=None,
             matvec_of=None, w_start=None) -> ForwardState:
    """NS solve + primal buoy ODE (``OCP_dolfin.py:314-330``). ``ode_impl``
    overrides the ODE stage (multi-chip: a shard_map of ``_primal_ode``).
    ``w_start``: warm Newton start — skips the continuation ladder
    (see ``_solve_ns``)."""
    res = _solve_ns(prob, f_quad, matvec_of=matvec_of, w_start=w_start)
    u, _ = prob.space.split(res.w)
    ode = (ode_impl or _primal_ode)(prob, u)
    return ForwardState(res.w, ode.x, ode.u_values, ode.mask, res,
                        ode.x_raw, ode.kfail)


forward = jax.jit(_forward, static_argnames=("ode_impl", "matvec_of"))


@jax.jit
def cost(prob: OCPProblem, u_values: jnp.ndarray,
         f_quad: jnp.ndarray) -> jnp.ndarray:
    """J = 0.5 Σ_k Σ_t h‖u − u_d‖² + α/2 ∫_{Γ₁}|f|² ds
    (``OCP_dolfin.py:258-261``; masked buoys still contribute their
    partial u_values, as in the reference). ``buoy_weights`` (multi-chip
    padding lanes) scale the tracking term per buoy."""
    track = prob.h * jnp.sum((u_values - prob.u_d) ** 2, axis=-1)
    if prob.buoy_weights is not None:
        track = track * prob.buoy_weights[:, None]
    part_a = 0.5 * jnp.sum(track)
    part_b = 0.5 * prob.alpha * jnp.sum(
        prob.bq.weights * jnp.sum(f_quad ** 2, axis=-1))
    return part_a + part_b


def _adjoint_rhs_body(prob: OCPProblem, u: jnp.ndarray,
                      grad_u: jnp.ndarray, x: jnp.ndarray,
                      u_values: jnp.ndarray, mask: jnp.ndarray,
                      x_raw: jnp.ndarray, kfail: jnp.ndarray) -> jnp.ndarray:
    """Adjoint ODE + point-source RHS over explicit buoy-axis arrays — the
    buoy-parallel stage the multi-chip path shard_maps. ``buoy_weights``
    (padding lanes) are dropped like escaped buoys in reference mode and
    gated out of ``active_t`` in consistent mode."""
    from .ode.adjoint import solve_adjoint_ode_consistent
    # pallas backend: the WHOLE adjoint recursion (∇u trajectory eval +
    # backward μ scan) runs as one fused Pallas kernel in double-single
    # f32 (ode/pallas_adjoint.py; matches the f64 path to ~1e-12). The
    # eval-plus-f64-scan stage it replaces was 0.159 s of the 0.312 s
    # fused-iteration device time at K=10⁴ (round-4 profile).
    fused_adj = prob.ode_backend == "pallas"
    ode_grid = prob.grid if fused_adj else None
    w_b = prob.buoy_weights
    if prob.adjoint_mode == "consistent":
        if fused_adj:
            from .ode.pallas_adjoint import solve_adjoint_ode_pallas
            nt = x_raw.shape[1]
            vlimit = jnp.where(mask, kfail - 1, nt)
            mu = solve_adjoint_ode_pallas(
                prob.grid, grad_u, x_raw, u_values, prob.u_d,
                jnp.zeros_like(mask), prob.h, vlimit=vlimit)
        else:
            mu = solve_adjoint_ode_consistent(
                prob.space, grad_u, x_raw, u_values, prob.u_d,
                mask, kfail, prob.h, grid=ode_grid)
        t = jnp.arange(prob.nt)[None, :]
        kf = kfail[:, None]
        pre = t <= kf - 1
        quirk = t == kf + 1                     # u_values[kf+1] = u(center)
        m = mask[:, None]
        x_eff = jnp.where(m[..., None],
                          jnp.where(pre[..., None], x_raw, prob.center),
                          x)
        active_t = jnp.where(m, pre | quirk, True)
        if w_b is not None:
            active_t = active_t & (w_b[:, None] > 0)
        return point_source_rhs(prob.space, u, x_eff, mu, prob.u_d, mask,
                                prob.h, prob.center,
                                method=prob.psrc_method, active_t=active_t,
                                grid=prob.grid, u_values=u_values)
    mask_eff = mask if w_b is None else (mask | (w_b == 0))
    if fused_adj:
        from .ode.pallas_adjoint import solve_adjoint_ode_pallas
        mu = solve_adjoint_ode_pallas(prob.grid, grad_u, x, u_values,
                                      prob.u_d, mask_eff, prob.h)
    else:
        mu = solve_adjoint_ode(prob.space, grad_u, x, u_values,
                               prob.u_d, mask_eff, prob.h, grid=ode_grid)
    return point_source_rhs(prob.space, u, x, mu, prob.u_d, mask_eff,
                            prob.h, prob.center, method=prob.psrc_method,
                            grid=prob.grid, u_values=u_values)


def adjoint_rhs(prob: OCPProblem, fwd: ForwardState,
                adjoint_rhs_impl=None) -> jnp.ndarray:
    """∇u projection + adjoint ODE + point-source RHS — the adjoint solve's
    load vector b (``OCP_dolfin.py:328-366``), exposed separately so
    staged callers can run RHS and solve as separate device programs.

    adjoint_mode="consistent" keeps escaped buoys' pre-escape adjoint
    contributions (μ over t ≤ kfail−1 on the raw trajectory, point sources
    at the raw positions plus the u(center) quirk term at kfail+1) so the
    gradient matches FD in escape regimes; identical to the reference path
    when no buoy escapes. ``adjoint_rhs_impl`` overrides the buoy-axis
    stage (multi-chip: a psum-reduced shard_map of ``_adjoint_rhs_body``).
    """
    u, _ = prob.space.split(fwd.w)
    grad_u = prob.projector.project(prob.space, u)
    body = adjoint_rhs_impl or _adjoint_rhs_body
    return body(prob, u, grad_u, fwd.x, fwd.u_values, fwd.mask,
                fwd.x_raw, fwd.kfail)


def adjoint_operators(prob: OCPProblem, w: jnp.ndarray):
    """(fine adjoint operator, coarse adjoint operator or None). The
    coarse assembly exists for legacy contexts without a precomputed
    coarse hierarchy, and for ``mg_coarse_krylov > 0`` where the
    state-assembled coarse adjoint operator feeds the convection-aware
    inner Krylov of the coarse correction (solve/mg.py)."""
    op = assemble.adjoint_operator(prob.space, prob.bq, w, prob.bc_dofs)
    op_c = None
    if prob.linear_solver == "mg" and (
            (prob.mg.ainv_c is None and prob.mg.sub is None)
            or getattr(prob, "mg_coarse_krylov", 0) > 0):
        w_c = mg_mod.inject_state(prob.mg, prob.space, w)
        op_c = assemble.adjoint_operator(prob.mg.space_c, prob.mg.bq_c,
                                         w_c, prob.mg.bc_dofs_c)
    return op, op_c


def _solve_adjoint_flagged(prob: OCPProblem, fwd: ForwardState,
                           adjoint_rhs_impl=None, matvec_of=None
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Adjoint RHS + adjoint NS solve (``OCP_dolfin.py:328-371``).
    Returns (mixed adjoint state z, converged flag). The flag is only
    informative on the mg path — the dense paths are unconditionally
    accurate (direct solve / reuse path with fresh-LU fallback)."""
    b = adjoint_rhs(prob, fwd, adjoint_rhs_impl=adjoint_rhs_impl)
    op, op_c = adjoint_operators(prob, fwd.w)
    if prob.linear_solver == "mg":
        # the adjoint operator's Laplacian is UNIT-viscosity (the
        # reference quirk, OCP_dolfin.py:344) while the frozen hierarchy
        # is assembled at ν — the adjoint solve is "a continuation rung
        # at ν=1", so the rung-scaling nu_scale = 1/ν applies (at ν=1
        # this is the static 1.0 fast path, bit-identical)
        sol = mg_mod.solve_operator_mg(
            op, op_c, prob.mg, prob.space, b, prob.bc_vals,
            matvec_of=matvec_of, pre=prob.mg_pre, post=prob.mg_post,
            coarse_krylov=getattr(prob, "mg_coarse_krylov", 0),
            nu_scale=1.0 / prob.nu)
        return sol.x, sol.converged
    if prob.adjoint_reuse_lu and fwd.newton.fac is not None:
        # one factorization per GD iteration: the Newton solve's float32
        # LU factors, transposed, precondition the adjoint solve (the
        # adjoint operator IS the transposed Jacobian at ν=1); a fresh-LU
        # lax.cond fallback guarantees accuracy unconditionally
        z, _ = solve_operator_reuse_t(op, b, prob.bc_vals, fwd.newton.fac,
                                      refine_iters=prob.refine_iters)
        return z, jnp.asarray(True)
    return solve_operator(op, b, prob.bc_vals,
                          refine_iters=prob.refine_iters), jnp.asarray(True)


def _solve_adjoint(prob: OCPProblem, fwd: ForwardState) -> jnp.ndarray:
    return _solve_adjoint_flagged(prob, fwd)[0]


solve_adjoint = jax.jit(_solve_adjoint)


def sum_mask(prob: OCPProblem, mask: jnp.ndarray) -> jnp.ndarray:
    """Escaped-buoy count, weight-aware (padding lanes never count)."""
    if prob.buoy_weights is None:
        return jnp.sum(mask)
    return jnp.sum(mask * prob.buoy_weights)


def reduced_gradient(prob: OCPProblem, f: Control,
                     z: jnp.ndarray) -> Control:
    """g = αf − z restricted to Γ₁ (``OCP_dolfin.py:379,387,426``)."""
    zu, _ = prob.space.split(z)
    z_quad = boundary_eval_velocity(prob.space, prob.bq, zu)
    return Control(prob.alpha * f.quad - z_quad,
                   prob.alpha * f.p2 - zu)


# ---------------------------------------------------------------------------
# differentiable NS solve (implicit function theorem)
# ---------------------------------------------------------------------------
#
# A capability beyond the reference: the Newton solve is equipped with a
# custom VJP (adjoint of the converged state: J(w*)ᵀ λ = w̄, f̄ = Lᵀ λ), so
# jax.grad of the WHOLE pipeline J(f) — NS + ODE + cost — yields the exact
# discrete gradient. Used to cross-check the reference's (continuous-then-
# discretized, hence only consistent) adjoint gradient (SURVEY §7.2 step 5).

def _vjp_matvec_t(op, x):
    """Exact float64 Aᵀ@x via the element matrices (for refinement)."""
    y = jnp.zeros(op.n, x.dtype)
    xm = x.at[op.bc_dofs].set(0.0)   # transpose of identity-row masking
    y = y.at[op.cell_dofs].add(
        jnp.einsum("cab,ca->cb", op.cell_mats, xm[op.cell_dofs]))
    if op.facet_mats is not None:
        y = y.at[op.facet_dofs].add(
            jnp.einsum("fab,fa->fb", op.facet_mats, xm[op.facet_dofs]))
    return y.at[op.bc_dofs].add(x[op.bc_dofs])


# XLA's TPU blocked LU stages an (N, 128) fp32 panel in scoped VMEM; the
# default 16 MB limit caps dense solves at ~16k mixed dofs (Nx≈40).
# Raising the limit unlocks Nx≈48-56 (measured: Nx=48 LU compiles and runs
# at 64 MB; v5e VMEM is 128 MB physical).
LARGE_SOLVE_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": 65536}

# staged-driver variants with the raised limit (the plain ``forward``/
# ``solve_adjoint`` jits hit the default 16 MB cap at ~15.6k mixed dofs —
# observed: L-shape resolution 50, ndof=17378, "Ran out of memory in
# memory space vmem ... LuDecompositionBlock 17.05M > 16.00M")
forward_hires = jax.jit(_forward,
                        compiler_options=LARGE_SOLVE_COMPILER_OPTIONS)
solve_adjoint_hires = jax.jit(_solve_adjoint,
                              compiler_options=LARGE_SOLVE_COMPILER_OPTIONS)


def needs_raised_vmem(prob: OCPProblem) -> bool:
    """Dense direct solves beyond ~15k dofs need the raised scoped-VMEM
    limit on TPU (the LU panel is n·1024 bytes vs the 16 MB default).
    The mg path stages no fine LU, but its coarse velocity LU hits the
    same cap once the coarse grid passes ~15k velocity dofs (Nx≥96)."""
    if jax.default_backend() != "tpu":
        return False
    if prob.linear_solver != "mg":
        return prob.space.ndof > 15000
    return 2 * prob.mg.space_c.n_p2 > 15000


def stage_fns(prob: OCPProblem):
    """(forward, solve_adjoint) jitted appropriately for the problem
    size/backend — the host driver and grad-check probes route through
    this so large dense problems get the raised scoped-VMEM limit."""
    if needs_raised_vmem(prob):
        return forward_hires, solve_adjoint_hires
    return forward, solve_adjoint


def make_high_resolution_step(prob: OCPProblem, **gd_kwargs):
    """jitted gd_step with the raised scoped-VMEM limit for dense direct
    solves beyond ~16k dofs (TPU only; plain jit elsewhere). ``prob`` is a
    jit argument, not a closure — see ``make_staged_pair`` (closed-over
    tables become HLO constants and trip the remote-compile helper's
    request-size cap)."""
    def step(p: OCPProblem, f: Control, lr):
        return gd_step(p, f, lr, **gd_kwargs)

    jitted = (jax.jit(step) if jax.default_backend() == "cpu"
              else jax.jit(step,
                           compiler_options=LARGE_SOLVE_COMPILER_OPTIONS))
    return lambda f, lr: jitted(prob, f, lr)


class StagedPrograms(NamedTuple):
    """Consolidated stage programs for tunnel-friendly host-driven loops
    (scripts/hires_mg_run.py): every per-iteration device computation is
    packed into three XLA programs, so one GD iteration costs ~5 dispatch
    round trips instead of the ~15 an eager-op host loop pays (each eager
    jnp call through the remote-TPU tunnel is a full round trip — measured
    16–25 s/iteration of pure dispatch overhead at Nx=64/96)."""
    begin: object    # f_quad → (fwd, J)                [once per run]
    grad: object     # (f, fwd) → (z, g, gradj, div_u, adj_ok)
    probe: object    # (f, g, lr) → (f_new, fwd_new, J_new)
    record: object   # (u_values, f_quad) → J           [J(old u, new f)]
    # viscosity-continuation support (mg path): the ladder as SHORT
    # bounded programs — one traced-ν rung program executed n_rungs+1
    # times from the host — instead of one n_rungs×Newton device burst
    # (observed to crash the tunneled TPU worker at Nx=64 ν=0.01), and
    # warm-started begin/probe that skip the ladder entirely (the ladder
    # is a basin-finding device; a previous accepted state is already in
    # the basin, and Newton's exact-f64 test fixes accuracy).
    rung: object = None        # (f_quad, w, nu_k) → w'   [traced ν]
    begin_warm: object = None  # (f_quad, w) → (fwd, J)
    probe_warm: object = None  # (f, g, lr, w) → (f_new, fwd_new, J_new)


def make_staged_pair(prob: OCPProblem, ode_impl=None,
                     adjoint_rhs_impl=None, matvec_of=None
                     ) -> StagedPrograms:
    """Build the staged-iteration programs (same math as ``gd_step``,
    split so a host-side Armijo loop can drive them; the accepted probe's
    forward state carries into the next iteration — the
    ``reuse_ls_forward`` trade, bit-identical because the updated control
    equals the probed control exactly).

    ``prob`` is threaded as a jit ARGUMENT, never a closure: a closed-over
    problem pytree becomes HLO constants, and the serialized module (285 MB
    of coarse inverse alone at Nx=64) trips the remote-compile helper's
    request-size cap — observed as ``HTTP 413: length limit exceeded``,
    the failure behind round 2's "fused hi-res step crashes the compile
    helper" note."""
    def _begin(p, f_quad):
        fwd = _forward(p, f_quad, ode_impl=ode_impl, matvec_of=matvec_of)
        return fwd, cost(p, fwd.u_values, f_quad)

    def _grad(p, f: Control, fwd: ForwardState):
        z, adj_ok = _solve_adjoint_flagged(
            p, fwd, adjoint_rhs_impl=adjoint_rhs_impl,
            matvec_of=matvec_of)
        g = reduced_gradient(p, f, z)
        gradj = ctrl_mod.boundary_inner(p.bq, g, Control(-g.quad, -g.p2))
        u, _ = p.space.split(fwd.w)
        return z, g, gradj, assemble.divergence_l2(p.space, u), adj_ok

    def _probe(p, f: Control, g: Control, lr):
        f_new = f.axpy(-lr, g)
        fwd_new = _forward(p, f_new.quad, ode_impl=ode_impl,
                           matvec_of=matvec_of)
        return f_new, fwd_new, cost(p, fwd_new.u_values, f_new.quad)

    def _record(p, u_values, f_quad):
        return cost(p, u_values, f_quad)

    def _begin_warm(p, f_quad, w_start):
        fwd = _forward(p, f_quad, ode_impl=ode_impl, matvec_of=matvec_of,
                       w_start=w_start)
        return fwd, cost(p, fwd.u_values, f_quad)

    def _probe_warm(p, f: Control, g: Control, lr, w_start):
        f_new = f.axpy(-lr, g)
        fwd_new = _forward(p, f_new.quad, ode_impl=ode_impl,
                           matvec_of=matvec_of, w_start=w_start)
        return f_new, fwd_new, cost(p, fwd_new.u_values, f_new.quad)

    def _rung(p, f_quad, w_start, nu_k):
        # one continuation rung at traced ν (so all rungs share ONE
        # compiled program); mirrors the ladder body of _solve_ns — only
        # reachable on frozen-hierarchy mg contexts (coarse fn None
        # unless the convection-aware coarse Krylov is on)
        ck = getattr(p, "mg_coarse_krylov", 0)
        coarse_fn = None
        if ck > 0:
            def coarse_fn(w):
                w_c = mg_mod.inject_state(p.mg, p.space, w)
                return assemble.ns_operator(p.mg.space_c, p.mg.bq_c, w_c,
                                            nu_k, p.mg.bc_dofs_c)
        res_k = mg_mod.newton_solve_mg(
            lambda w: assemble.ns_residual(p.space, p.bq, w, f_quad, nu_k),
            lambda w: assemble.ns_operator(p.space, p.bq, w, nu_k,
                                           p.bc_dofs),
            coarse_fn, p.mg, p.space, w_start, p.bc_dofs, p.bc_vals,
            matvec_of=matvec_of, pre=p.mg_pre, post=p.mg_post,
            nu_scale=nu_k / p.nu, coarse_krylov=ck)
        return res_k.w

    opts = (LARGE_SOLVE_COMPILER_OPTIONS
            if needs_raised_vmem(prob) else None)
    jit = (jax.jit if opts is None
           else partial(jax.jit, compiler_options=opts))
    begin, grad, probe = jit(_begin), jit(_grad), jit(_probe)
    begin_warm, probe_warm = jit(_begin_warm), jit(_probe_warm)
    record = jax.jit(_record)
    rung = None
    if (prob.linear_solver == "mg"
            and (prob.mg.ainv_c is not None or prob.mg.sub is not None)):
        rung_j = jit(_rung)
        rung = lambda f_quad, w, nu_k: rung_j(prob, f_quad, w, nu_k)
    return StagedPrograms(
        lambda f_quad: begin(prob, f_quad),
        lambda f, fwd: grad(prob, f, fwd),
        lambda f, g, lr: probe(prob, f, g, lr),
        lambda u_values, f_quad: record(prob, u_values, f_quad),
        rung=rung,
        begin_warm=lambda f_quad, w: begin_warm(prob, f_quad, w),
        probe_warm=lambda f, g, lr, w: probe_warm(prob, f, g, lr, w))


class NewtonStager(NamedTuple):
    """Host-driven mg Newton: every field is ONE bounded device program.

    The tunneled TPU worker reliably survives short programs (the 5-8 s
    continuation rungs, the Nx<=96 staged stages) but crashes on
    minutes-long single programs (observed three times on hires
    begin/probe programs whose in-program Newton while_loop runs many
    FGMRES-heavy steps). Splitting the Newton loop at step granularity
    bounds every device burst to one assemble + FGMRES + damping pass;
    the host drives the convergence test (the reference's loop structure,
    ``OCP_dolfin.py:314-325``, just across the wire)."""
    init: object     # (f_quad, w0, nu) → (op0, op0_c, r, rnorm)
    #                  op0_c: coarse operator at w0 (mg_coarse_krylov>0)
    #                  or None
    step: object     # (f_quad, w, r, rnorm, op0, op0_c, nu, nu_scale,
    #                  tol) → (w', r', rnorm')
    finish: object   # (f_quad, w, it, rnorm, conv) → (fwd, J)
    axpy: object     # (f, g, lr) → f_new


def make_newton_stager(prob: OCPProblem, ode_impl=None,
                       matvec_of=None, restart: int = 60,
                       max_restarts: int = 4,
                       step_tol: float = 1e-6) -> NewtonStager:
    """Build the stepped-Newton programs (mg path; same math as
    ``solve/mg.py::newton_solve_mg`` — frozen-at-w0 preconditioner,
    residual-monotone damping with full step preferred, polish step with
    tightened Krylov tolerance). ν and nu_scale are TRACED so one step
    program serves every continuation rung and the target solve."""
    assert prob.linear_solver == "mg"

    def _bc_residual(p, f_quad, w, nu):
        r = assemble.ns_residual(p.space, p.bq, w, f_quad, nu)
        return r.at[p.bc_dofs].set(w[p.bc_dofs] - p.bc_vals)

    def _init(p, f_quad, w0, nu):
        op0 = assemble.ns_operator(p.space, p.bq, w0, nu, p.bc_dofs)
        op0_c = None
        if getattr(p, "mg_coarse_krylov", 0) > 0:
            w_c = mg_mod.inject_state(p.mg, p.space, w0)
            op0_c = assemble.ns_operator(p.mg.space_c, p.mg.bq_c, w_c,
                                         nu, p.mg.bc_dofs_c)
        r0 = _bc_residual(p, f_quad, w0, nu)
        return op0, op0_c, r0, jnp.linalg.norm(r0)

    def _step(p, f_quad, w, r, rnorm, op0, op0_c, nu, nu_scale, tol):
        M32 = mg_mod.make_block_preconditioner(
            p.mg, p.space, op0, op0_c, dtype=jnp.float32,
            pre=p.mg_pre, post=p.mg_post, nu_scale=nu_scale,
            coarse_krylov=getattr(p, "mg_coarse_krylov", 0))
        op = assemble.ns_operator(p.space, p.bq, w, nu, p.bc_dofs)
        if matvec_of is None:
            mv32 = mg_mod._stencil_or_scatter(p.mg.st_mixed, op,
                                              jnp.float32)
        else:
            mv32 = matvec_of(op)
        from .solve import krylov
        sol = krylov.fgmres(mv32, (-r).astype(jnp.float32), M=M32,
                            restart=restart, max_restarts=max_restarts,
                            tol=tol)
        dw = sol.x.astype(jnp.float64)
        # residual-monotone damping, full step preferred (mg.py:make_body)
        w_c = w + dw
        r_c = _bc_residual(p, f_quad, w_c, nu)
        n_c = jnp.linalg.norm(r_c)
        accept = n_c < rnorm
        for theta in (0.5, 0.25, 0.125):
            cand = w + theta * dw
            rc2 = _bc_residual(p, f_quad, cand, nu)
            nc2 = jnp.linalg.norm(rc2)
            take = (~accept) & (nc2 < rnorm)
            w_c = jnp.where(take, cand, w_c)
            r_c = jnp.where(take, rc2, r_c)
            n_c = jnp.where(take, nc2, n_c)
            accept = accept | take
        return w_c, r_c, n_c

    def _finish(p, f_quad, w, it, rnorm, conv):
        newton = NewtonResult(w, it, rnorm, conv)
        u, _ = p.space.split(w)
        ode = (ode_impl or _primal_ode)(p, u)
        fwd = ForwardState(w, ode.x, ode.u_values, ode.mask, newton,
                           ode.x_raw, ode.kfail)
        return fwd, cost(p, fwd.u_values, f_quad)

    def _axpy(p, f: Control, g: Control, lr):
        del p
        return f.axpy(-lr, g)

    opts = (LARGE_SOLVE_COMPILER_OPTIONS
            if needs_raised_vmem(prob) else None)
    jit = (jax.jit if opts is None
           else partial(jax.jit, compiler_options=opts))
    init, step, finish = jit(_init), jit(_step), jit(_finish)
    axpy = jax.jit(_axpy)
    return NewtonStager(
        lambda f_quad, w0, nu: init(prob, f_quad, w0, nu),
        lambda f_quad, w, r, rnorm, op0, op0_c, nu, nu_scale, tol: step(
            prob, f_quad, w, r, rnorm, op0, op0_c, nu, nu_scale, tol),
        lambda f_quad, w, it, rnorm, conv: finish(
            prob, f_quad, w, it, rnorm, conv),
        lambda f, g, lr: axpy(prob, f, g, lr))


def run_newton_staged(stager: NewtonStager, f_quad, w0, nu: float,
                      nu_scale: float = 1.0, rtol: float = 1e-9,
                      atol: float = 1e-10, max_iter: int = 50,
                      polish: int = 1, step_tol: float = 1e-6,
                      sync=None, max_refreeze: int = 0,
                      stall_ratio: float = 0.5, on_step=None,
                      stagnation_break: int = 0):
    """Drive the stepped Newton from the host — the ``newton_solve_mg``
    loop with one device program per step. Returns (w, it, rnorm,
    converged). ``sync``: optional callable forcing a host transfer after
    each step (bounds the async dispatch queue through the tunnel).

    ``max_refreeze`` > 0 (the convection-dominated robustness knob,
    VERDICT r2 item 9): when a step reduces the residual by less than
    ``stall_ratio``, re-freeze the preconditioner at the CURRENT iterate
    — ``stager.init`` rebuilds the frozen fine operator (smoother
    diagonal picks up the convection at w) and, with
    ``mg_coarse_krylov`` > 0, the coarse linearization the inner Krylov
    solves. 0 = off (the ν=1 production paths stay bit-identical).
    ``on_step(it, rn, event)``: per-step observability callback
    (event ∈ {"", "refreeze"}).

    ``stagnation_break`` > 0: give up after that many CONSECUTIVE steps
    contracting by less than 3% — a flatlined Newton (the ν=0.01 warm
    line-search probe pins at rn≈6e-2 with ~1.000/step; observed r4a)
    cannot recover within any cap, and each wasted step is a full
    FGMRES program. Legitimate slow solves (r3h's 0.78/step) never
    trigger. 0 = off. The caller sees converged=False and applies its
    own fallback (the staged runner's cold-ladder retry)."""
    nu_t = jnp.asarray(float(nu))
    sc_t = jnp.asarray(float(nu_scale))
    op0, op0_c, r, rn_dev = stager.init(f_quad, w0, nu_t)
    r0norm = rn = float(rn_dev)
    w, it = w0, 0
    refrozen = 0
    flat = 0
    while rn > atol and rn > rtol * r0norm and it < max_iter:
        prev = rn
        w, r, rn_dev = stager.step(f_quad, w, r, jnp.asarray(rn), op0,
                                   op0_c, nu_t, sc_t,
                                   jnp.asarray(step_tol))
        rn = float(rn_dev)
        it += 1
        if on_step is not None:
            on_step(it, rn, "")
        if sync is not None:
            sync(w)
        flat = flat + 1 if rn > 0.97 * prev else 0
        # only bail as FAILED if the thresholds are genuinely unmet — a
        # slowly-contracting solve that crosses rtol·r0/atol exactly on
        # the Nth flat step must not be misreported (it would trigger the
        # caller's cold-ladder retry for nothing; advisor round-4)
        if (stagnation_break and flat >= stagnation_break
                and rn > atol and rn > rtol * r0norm):
            return w, it, rn, False
        if (refrozen < max_refreeze and rn > stall_ratio * prev
                and rn > atol and rn > rtol * r0norm):
            op0, op0_c, r, rn_dev = stager.init(f_quad, w, nu_t)
            rn = float(rn_dev)
            refrozen += 1
            if on_step is not None:
                on_step(it, rn, "refreeze")
    converged = (rn <= atol) or (rn <= rtol * r0norm)
    tight = min(step_tol, 1e-8)
    for _ in range(polish):
        w, r, rn_dev = stager.step(f_quad, w, r, jnp.asarray(rn), op0,
                                   op0_c, nu_t, sc_t, jnp.asarray(tight))
        rn = float(rn_dev)
        it += 1
    # the polish step may cross the threshold — credit it (the flag
    # gates a hard assert in the staged hires runner)
    converged = converged or (rn <= atol) or (rn <= rtol * r0norm)
    return w, it, rn, converged


class AdjointStager(NamedTuple):
    """Host-driven mg adjoint solve: ``solve_operator_mg``'s refinement
    loop split at ROUND granularity — one bounded device program per
    fp64-refinement round (each ≈ one stepped-Newton program: one FGMRES
    restart schedule + two exact matvecs). At Nx=256 the single fused
    grad program (RHS + all rounds) is a minutes-long device burst that
    crashed the tunneled TPU worker (the same failure mode the stepped
    Newton bounds for the forward solve); every Newton-step-sized
    program around it survived."""
    rhs: object      # (f, fwd) → (b, op, op_c, div_u, bnorm)
    round: object    # (op, op_c, b, x) → (x', rnorm)
    finish: object   # (f, z) → (g, gradj)


def make_adjoint_stager(prob: OCPProblem, adjoint_rhs_impl=None,
                        matvec_of=None, tol: float = 1e-11,
                        restart: int = 60, max_restarts: int = 4,
                        inner_tol: float = 1e-6) -> AdjointStager:
    """Build the staged adjoint programs (mg path; same math — and the
    same operation order, hence bit-identical results — as
    ``solve_operator_mg`` + ``reduced_gradient``)."""
    assert prob.linear_solver == "mg"

    def _rhs(p, f: Control, fwd: ForwardState):
        b = adjoint_rhs(p, fwd, adjoint_rhs_impl=adjoint_rhs_impl)
        op, op_c = adjoint_operators(p, fwd.w)
        b = assemble.apply_bc_vector(b, op.bc_dofs, p.bc_vals)
        u, _ = p.space.split(fwd.w)
        return (b, op, op_c, assemble.divergence_l2(p.space, u),
                jnp.linalg.norm(b))

    def _round(p, op, op_c, b, x):
        # nu_scale = 1/ν: the adjoint operator's Laplacian is unit-
        # viscosity (OCP_dolfin.py:344 quirk) while the hierarchy is
        # frozen at ν — see solve_operator_mg. At ν=1: static no-op.
        M32 = mg_mod.make_block_preconditioner(
            p.mg, p.space, op, op_c, dtype=jnp.float32,
            pre=p.mg_pre, post=p.mg_post,
            coarse_krylov=getattr(p, "mg_coarse_krylov", 0),
            nu_scale=1.0 / p.nu)
        if matvec_of is not None:
            mv64 = matvec_of(op)
            mv32 = mg_mod.op_matvec(op, jnp.float32)
        else:
            mv64 = (op.matvec64 if p.mg.st_mixed is None
                    else mg_mod._stencil_or_scatter(p.mg.st_mixed, op,
                                                    jnp.float64))
            mv32 = mg_mod._stencil_or_scatter(p.mg.st_mixed, op,
                                              jnp.float32)
        from .solve import krylov
        r = b - mv64(x)
        sol = krylov.fgmres(mv32, r.astype(jnp.float32), M=M32,
                            restart=restart, max_restarts=max_restarts,
                            tol=inner_tol)
        x = x + sol.x.astype(jnp.float64)
        return x, jnp.linalg.norm(b - mv64(x))

    def _finish(p, f: Control, z):
        g = reduced_gradient(p, f, z)
        gradj = ctrl_mod.boundary_inner(p.bq, g, Control(-g.quad, -g.p2))
        return g, gradj

    opts = (LARGE_SOLVE_COMPILER_OPTIONS
            if needs_raised_vmem(prob) else None)
    jit = (jax.jit if opts is None
           else partial(jax.jit, compiler_options=opts))
    rhs, rnd, fin = jit(_rhs), jit(_round), jit(_finish)
    return AdjointStager(
        lambda f, fwd: rhs(prob, f, fwd),
        lambda op, op_c, b, x: rnd(prob, op, op_c, b, x),
        lambda f, z: fin(prob, f, z))


def run_adjoint_staged(stager: AdjointStager, f: Control,
                       fwd: ForwardState, tol: float = 1e-11,
                       max_rounds: int = 4, sync=None, on_round=None,
                       accept_rel: float = 1e-9):
    """Drive the staged adjoint solve from the host. Returns
    (z, g, gradj, div_u, converged) — the ``StagedPrograms.grad``
    quintuple, at one bounded device program per refinement round.
    ``max_rounds`` beyond the in-program default of 4 is nearly free
    here (each extra round is one more bounded program, not a bigger
    while_loop) — deep-hierarchy problems (Nx=256, 4 levels) contract
    ~1e-2.5/round and need ~5. ``on_round(round, rnorm)``: per-round
    observer for convergence logging.

    ``accept_rel``: the fp64-refinement floor κ(A)·ε grows with
    resolution — at Nx=256 (592k dofs) the relative residual plateaus
    near 3e-11 while ``tol`` asks 1e-11, so a healthy solve can stall
    just above target. A round that fails to contract by 3× ends the
    loop (more rounds cannot help at the floor) and the solve counts as
    converged iff the plateau is at or below ``accept_rel`` — far below
    anything the gradient needs, while a genuine preconditioner-quality
    stall (e.g. the ν=0.01 Stokes-coarse stall at 3.6e-2) still reports
    non-convergence."""
    b, op, op_c, div_u, bnorm_dev = stager.rhs(f, fwd)
    bnorm = float(bnorm_dev)
    target = tol * max(bnorm, 1e-300)
    x = jnp.zeros_like(b)
    rn, rounds, prev = bnorm, 0, None
    while rn > target and rounds < max_rounds:
        x, rn_dev = stager.round(op, op_c, b, x)
        rn = float(rn_dev)
        rounds += 1
        if on_round is not None:
            on_round(rounds, rn / max(bnorm, 1e-300))
        if sync is not None:
            sync(x)
        if prev is not None and rn > prev / 3.0:
            break                      # at the refinement floor
        prev = rn
    g, gradj = stager.finish(f, x)
    ok = rn <= max(target, accept_rel * max(bnorm, 1e-300))
    return x, g, gradj, div_u, ok


def make_differentiable_ns_solver(prob: OCPProblem):
    """Return f_quad → w with a custom VJP (implicit function theorem):
    J(w*)ᵀ λ = w̄, then f̄ = Lᵀ λ with L the Γ₁ load operator."""
    from .ops import linalg as _linalg

    @jax.custom_vjp
    def solve(f_quad):
        return solve_ns(prob, f_quad).w

    def fwd(f_quad):
        w = solve_ns(prob, f_quad).w
        return w, w

    def bwd(w, w_bar):
        op = assemble.ns_operator(prob.space, prob.bq, w, prob.nu,
                                  prob.bc_dofs)
        fac_t = _linalg.factorize(op.dense().T)
        lam = _linalg.solve_refined(
            fac_t, lambda x: _vjp_matvec_t(op, x), w_bar, iters=8)
        lam = lam.at[prob.bc_dofs].set(0.0)
        lam_u, _ = prob.space.split(lam)
        dofs = prob.space.cell_dofs_p2[prob.bq.cells]
        f_bar = jnp.einsum("fq,fqa,fai->fqi", prob.bq.weights, prob.bq.phi2,
                           lam_u[dofs])
        return (f_bar,)

    solve.defvjp(fwd, bwd)
    return solve


class GDStepResult(NamedTuple):
    f_new: Control
    lr: jnp.ndarray
    J: jnp.ndarray              # J(old u_values, new f)  (:426-429)
    div_u: jnp.ndarray
    fwd: ForwardState
    z: jnp.ndarray
    grad: Control               # αf − z (pre-update)
    gradj: jnp.ndarray          # ⟨g, −g⟩_{Γ₁} when line search on
    inner_iterations: jnp.ndarray
    diverged: jnp.ndarray       # non-finite Newton residual or cost — the
                                # LU-reuse fast path can diverge on stale
                                # factors (solve/newton.py); callers MUST
                                # check this and re-solve with
                                # newton_reuse_lu=False (opt/driver.py does)


def _gd_step(prob: OCPProblem, f: Control, lr: jnp.ndarray,
             use_line_search: bool = True, tau: float = 0.5,
             c_armijo: float = 1e-4, lr_min: float = 1e-6,
             max_ls_iters: int = 80, ode_impl=None, adjoint_rhs_impl=None,
             matvec_of=None) -> GDStepResult:
    """One full gradient-descent iteration (``OCP_dolfin.py:309-450``),
    including the Armijo backtracking line search as a lax.while_loop.

    Reference semantics kept: LR is NOT reset between outer iterations
    (caller passes the running LR back in); the accepted line-search state
    is discarded (the next outer iteration re-solves); J is recorded with
    the OLD u_values and the NEW control.

    The three static executor overrides are the multi-chip hooks
    (parallel/sharding.py): ``ode_impl`` shard_maps the primal ODE over
    the buoy axis, ``adjoint_rhs_impl`` the adjoint ODE + point sources,
    and ``matvec_of`` dof-shards the mg Krylov matvec — ONE line-search /
    update / divergence implementation serves every device layout.
    """
    fwd = _forward(prob, f.quad, ode_impl=ode_impl, matvec_of=matvec_of)
    z, adj_ok = _solve_adjoint_flagged(prob, fwd,
                                       adjoint_rhs_impl=adjoint_rhs_impl,
                                       matvec_of=matvec_of)
    g = reduced_gradient(prob, f, z)

    inner0 = jnp.asarray(0)
    if use_line_search:
        df = Control(-g.quad, -g.p2)                       # (:387)
        gradj = ctrl_mod.boundary_inner(prob.bq, g, df)    # (:388)
        cond_thresh = -c_armijo * gradj                    # (:389)
        j_old = cost(prob, fwd.u_values, f.quad)           # loop-invariant

        def ls_cond(state):
            lr_, it = state
            f_ls = f.quad + lr_ * df.quad
            res = _forward(prob, f_ls, ode_impl=ode_impl,
                           matvec_of=matvec_of)
            j_new = cost(prob, res.u_values, f_ls)
            accept = (j_old - j_new) >= lr_ * cond_thresh  # (:413)
            # lr_ <= lr_min: the body's max(tau*lr, lr_min) can no longer
            # decrease lr, so a further probe is the identical computation
            # — the reference would spin forever here (:415's floor makes
            # its while-loop non-terminating); accept the floored LR after
            # its one failed probe instead of burning max_ls_iters solves
            return (~accept) & (it < max_ls_iters) & (lr_ > lr_min)

        def ls_body(state):
            lr_, it = state
            return (jnp.maximum(tau * lr_, lr_min), it + 1)  # (:415)

        lr, inner_ls = jax.lax.while_loop(ls_cond, ls_body, (lr, inner0))
        inner = inner_ls + 1   # reference counts the accepting iteration
    else:
        gradj = jnp.asarray(0.0)
        inner = inner0

    f_new = f.axpy(-lr, g)                                  # (:426)
    j_rec = cost(prob, fwd.u_values, f_new.quad)            # (:429)
    u, _ = prob.space.split(fwd.w)
    div_u = assemble.divergence_l2(prob.space, u)           # (:430)
    diverged = ((~jnp.isfinite(fwd.newton.residual_norm))
                | (~jnp.isfinite(j_rec)) | (~adj_ok))
    return GDStepResult(f_new, lr, j_rec, div_u, fwd, z, g, gradj, inner,
                        diverged)


gd_step = partial(jax.jit, static_argnames=(
    "use_line_search", "tau", "c_armijo", "lr_min", "max_ls_iters",
    "ode_impl", "adjoint_rhs_impl", "matvec_of"))(_gd_step)


class GDTrajectory(NamedTuple):
    """Per-iteration scalars of a fused multi-iteration program."""
    J: jnp.ndarray                  # (n_steps,)
    lr: jnp.ndarray                 # (n_steps,) accepted LR per iteration
    div_u: jnp.ndarray              # (n_steps,)
    inner_iterations: jnp.ndarray   # (n_steps,)
    mask_count: jnp.ndarray         # (n_steps,) escaped buoys
    diverged: jnp.ndarray           # (n_steps,)


@partial(jax.jit, static_argnames=("n_steps", "use_line_search", "tau",
                                   "c_armijo", "lr_min", "max_ls_iters",
                                   "ode_impl", "adjoint_rhs_impl",
                                   "matvec_of"))
def gd_multi_step(prob: OCPProblem, f: Control, lr: jnp.ndarray,
                  n_steps: int, use_line_search: bool = True,
                  tau: float = 0.5, c_armijo: float = 1e-4,
                  lr_min: float = 1e-6, max_ls_iters: int = 80,
                  ode_impl=None, adjoint_rhs_impl=None, matvec_of=None):
    """``n_steps`` full GD iterations fused into ONE device program
    (a ``lax.scan`` over the ``gd_step`` body).

    Rationale: at small K the per-iteration device compute is sub-ms but
    each host-dispatched program pays the tunnel's ~29 ms RTT — the one
    cell where the reference's serial CPU (0.10 s/iter at K=10,
    ``plotting/histogram_plotting.py:9-10``) beat the per-program path.
    Scanning N iterations amortizes the dispatch to RTT/N. The scan body
    IS ``_gd_step`` — same line search, LR carry, J(old u, new f)
    recording — so the (J, LR) trajectory matches the host loop exactly;
    the only behavioral delta is that divergence/conv_crit checks happen
    on the host every ``n_steps`` instead of every step (the per-step
    ``diverged`` flags are returned for the caller to inspect).

    Returns ``(f_final, lr_final, GDTrajectory)``.
    """
    def body(carry, _):
        f_, lr_ = carry
        res = _gd_step(prob, f_, lr_, use_line_search=use_line_search,
                       tau=tau, c_armijo=c_armijo, lr_min=lr_min,
                       max_ls_iters=max_ls_iters, ode_impl=ode_impl,
                       adjoint_rhs_impl=adjoint_rhs_impl,
                       matvec_of=matvec_of)
        ys = GDTrajectory(res.J, res.lr, res.div_u, res.inner_iterations,
                          jnp.sum(res.fwd.mask), res.diverged)
        return (res.f_new, res.lr), ys

    (f_fin, lr_fin), traj = jax.lax.scan(body, (f, lr), None,
                                         length=n_steps)
    return f_fin, lr_fin, traj
