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
    # "reference" drops escaped buoys from the adjoint (OCP_dolfin.py:
    # 237-238,354-355); "consistent" keeps their pre-escape contributions
    # (gradient matches FD in escape regimes — beyond the reference)
    adjoint_mode: str = "reference"
    # primal-ODE point-eval backend (ode/grideval.py, ode/pallas_ode.py):
    # "gather" (locate/dofmap index tables), "grid" (table-free half-grid
    # stencil), "pallas" (fused 200-step TPU mega-kernel)
    ode_backend: str = "gather"
    grid: Optional[object] = None    # GridEval tables (grid/pallas backends)

    def tree_flatten(self):
        return ((self.space, self.bq, self.bc_dofs, self.bc_vals,
                 self.projector, self.u_d, self.x0, self.center, self.mg,
                 self.grid),
                (self.nu, self.alpha, self.h, self.nt, self.refine_iters,
                 self.newton_reuse_lu, self.psrc_method, self.linear_solver,
                 self.adjoint_mode, self.ode_backend))

    @classmethod
    def tree_unflatten(cls, aux, children):
        *head, mg, grid = children
        *scalars, linear_solver, adjoint_mode, ode_backend = aux
        return cls(*head, *scalars, mg=mg, linear_solver=linear_solver,
                   adjoint_mode=adjoint_mode, ode_backend=ode_backend,
                   grid=grid)

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
    if linear_solver == "mg":
        n_fine = (cfg.L_shape_resolution if cfg.L_shape
                  else cfg.unit_square_resolution)
        n_coarse = max(n_fine // 2, 4)
        mesh_c, _, g1c, g2c = _domain_setup(cfg, resolution=n_coarse)
        space_c = make_space(mesh_c)
        tags_c = mark_boundary_facets(mesh_c, g1c, tag=1)
        bq_c = make_boundary_quad(mesh_c, tags_c, tag=1)
        bc_dofs_c, _ = dirichlet_velocity_bc(mesh_c, space_c, g2c)
        mg_ctx = mg_mod.build_mg_context(space, space_c, bq_c, bc_dofs_c,
                                         cfg.viscosity, bq_f=bq,
                                         bc_dofs_f=bc_dofs)
        # problem-constant coarse inverse (the forward preconditioner is
        # frozen at w0=0 anyway; the adjoint reuses it as a Stokes-frozen
        # coarse correction): built host-side in memory-bounded programs
        from .ops import linalg as _linalg
        op_c0 = jax.jit(lambda w: assemble.ns_operator(
            space_c, bq_c, w, cfg.viscosity, bc_dofs_c))(
                jnp.zeros(space_c.ndof))
        vel_c0 = mg_mod.velocity_block(op_c0, 2 * space_c.n_p2)
        a_c0 = jax.jit(lambda o: o.dense())(vel_c0)
        mg_ctx = dataclasses.replace(
            mg_ctx, ainv_c=_linalg.explicit_inverse_host(a_c0))

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
        projector=GradProjector.build(space),
        u_d=jnp.asarray(u_d), x0=jnp.asarray(x0),
        center=jnp.asarray(center),
        nu=cfg.viscosity, alpha=cfg.alpha_scaled, h=cfg.dt, nt=nt,
        refine_iters=cfg.refine_iters,
        newton_reuse_lu=getattr(cfg, "newton_reuse_lu", False),
        psrc_method=getattr(cfg, "psrc_method", "scatter"),
        mg=mg_ctx, linear_solver=linear_solver,
        adjoint_mode=getattr(cfg, "adjoint_mode", "reference"),
        ode_backend=ode_backend,
        grid=(make_grideval(space) if ode_backend != "gather" else None))


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

@jax.jit
def solve_ns(prob: OCPProblem, f_quad: jnp.ndarray) -> NewtonResult:
    """Primal NS Newton solve, from w=0 (``OCP_dolfin.py:314-325``).

    linear_solver="mg" swaps the dense-LU Newton steps for the mesh-robust
    FGMRES + two-grid preconditioner (solve/mg.py) — the scaling path past
    ~21k mixed dofs where the TPU dense LU no longer fits."""
    def residual(w):
        return assemble.ns_residual(prob.space, prob.bq, w, f_quad, prob.nu)

    def operator(w):
        return assemble.ns_operator(prob.space, prob.bq, w, prob.nu,
                                    prob.bc_dofs)

    if prob.linear_solver == "mg":
        def coarse_operator(w):
            w_c = mg_mod.inject_state(prob.mg, prob.space, w)
            return assemble.ns_operator(prob.mg.space_c, prob.mg.bq_c, w_c,
                                        prob.nu, prob.mg.bc_dofs_c)

        return mg_mod.newton_solve_mg(
            residual, operator, coarse_operator, prob.mg, prob.space,
            jnp.zeros(prob.space.ndof), prob.bc_dofs, prob.bc_vals)

    return newton_solve(residual, operator, jnp.zeros(prob.space.ndof),
                        prob.bc_dofs, prob.bc_vals,
                        reuse_factorization=prob.newton_reuse_lu)


def _forward(prob: OCPProblem, f_quad: jnp.ndarray) -> ForwardState:
    """NS solve + primal buoy ODE (``OCP_dolfin.py:314-330``).

    The primal ODE runs on the configured ``ode_backend``: the index-table
    gather chain (reference-exact anchor), the table-free half-grid
    stencil, or the fused Pallas TPU kernel (one kernel for all nt-1 Euler
    steps; double-single f32 positions hold f64-equivalent accuracy)."""
    res = solve_ns(prob, f_quad)
    u, _ = prob.space.split(res.w)
    if prob.ode_backend == "pallas":
        from .ode.pallas_ode import solve_primal_ode_pallas
        ode = solve_primal_ode_pallas(prob.space, prob.grid, u, prob.x0,
                                      prob.h, prob.nt, prob.center)
    else:
        ode = solve_primal_ode(prob.space, u, prob.x0, prob.h, prob.nt,
                               prob.center,
                               grid=(prob.grid if prob.ode_backend == "grid"
                                     else None))
    return ForwardState(res.w, ode.x, ode.u_values, ode.mask, res,
                        ode.x_raw, ode.kfail)


forward = jax.jit(_forward)


@jax.jit
def cost(prob: OCPProblem, u_values: jnp.ndarray,
         f_quad: jnp.ndarray) -> jnp.ndarray:
    """J = 0.5 Σ_k Σ_t h‖u − u_d‖² + α/2 ∫_{Γ₁}|f|² ds
    (``OCP_dolfin.py:258-261``; masked buoys still contribute their
    partial u_values, as in the reference)."""
    part_a = 0.5 * jnp.sum(
        prob.h * jnp.sum((u_values - prob.u_d) ** 2, axis=-1))
    part_b = 0.5 * prob.alpha * jnp.sum(
        prob.bq.weights * jnp.sum(f_quad ** 2, axis=-1))
    return part_a + part_b


def adjoint_rhs(prob: OCPProblem, fwd: ForwardState) -> jnp.ndarray:
    """∇u projection + adjoint ODE + point-source RHS — the adjoint solve's
    load vector b (``OCP_dolfin.py:328-366``), exposed separately so
    staged callers can run RHS and solve as separate device programs.

    adjoint_mode="consistent" keeps escaped buoys' pre-escape adjoint
    contributions (μ over t ≤ kfail−1 on the raw trajectory, point sources
    at the raw positions plus the u(center) quirk term at kfail+1) so the
    gradient matches FD in escape regimes; identical to the reference path
    when no buoy escapes."""
    from .ode.adjoint import solve_adjoint_ode_consistent
    u, _ = prob.space.split(fwd.w)
    grad_u = prob.projector.project(prob.space, u)
    # pallas backend: route the batched ∇u trajectory evaluation through
    # the fused grid-eval kernel (matches the gather path to ~1e-12)
    ode_grid = prob.grid if prob.ode_backend == "pallas" else None
    if prob.adjoint_mode == "consistent":
        mu = solve_adjoint_ode_consistent(
            prob.space, grad_u, fwd.x_raw, fwd.u_values, prob.u_d,
            fwd.mask, fwd.kfail, prob.h, grid=ode_grid)
        t = jnp.arange(prob.nt)[None, :]
        kf = fwd.kfail[:, None]
        pre = t <= kf - 1
        quirk = t == kf + 1                     # u_values[kf+1] = u(center)
        m = fwd.mask[:, None]
        x_eff = jnp.where(m[..., None],
                          jnp.where(pre[..., None], fwd.x_raw, prob.center),
                          fwd.x)
        active_t = jnp.where(m, pre | quirk, True)
        b = point_source_rhs(prob.space, u, x_eff, mu, prob.u_d, fwd.mask,
                             prob.h, prob.center, method=prob.psrc_method,
                             active_t=active_t)
    else:
        mu = solve_adjoint_ode(prob.space, grad_u, fwd.x, fwd.u_values,
                               prob.u_d, fwd.mask, prob.h, grid=ode_grid)
        b = point_source_rhs(prob.space, u, fwd.x, mu, prob.u_d, fwd.mask,
                             prob.h, prob.center, method=prob.psrc_method)
    return b


def adjoint_operators(prob: OCPProblem, w: jnp.ndarray):
    """(fine adjoint operator, coarse adjoint operator or None)."""
    op = assemble.adjoint_operator(prob.space, prob.bq, w, prob.bc_dofs)
    op_c = None
    if prob.linear_solver == "mg":
        w_c = mg_mod.inject_state(prob.mg, prob.space, w)
        op_c = assemble.adjoint_operator(prob.mg.space_c, prob.mg.bq_c,
                                         w_c, prob.mg.bc_dofs_c)
    return op, op_c


def _solve_adjoint(prob: OCPProblem, fwd: ForwardState) -> jnp.ndarray:
    """Adjoint RHS + adjoint NS solve (``OCP_dolfin.py:328-371``).
    Returns the mixed adjoint state z."""
    b = adjoint_rhs(prob, fwd)
    op, op_c = adjoint_operators(prob, fwd.w)
    if prob.linear_solver == "mg":
        return mg_mod.solve_operator_mg(op, op_c, prob.mg, prob.space, b,
                                        prob.bc_vals).x
    return solve_operator(op, b, prob.bc_vals,
                          refine_iters=prob.refine_iters)


solve_adjoint = jax.jit(_solve_adjoint)


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
    solves beyond ~16k dofs (TPU only; plain jit elsewhere)."""
    def step(f: Control, lr):
        return gd_step(prob, f, lr, **gd_kwargs)

    if jax.default_backend() == "cpu":
        return jax.jit(step)
    return jax.jit(step, compiler_options=LARGE_SOLVE_COMPILER_OPTIONS)


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


@partial(jax.jit, static_argnames=("use_line_search", "tau", "c_armijo",
                                   "lr_min", "max_ls_iters"))
def gd_step(prob: OCPProblem, f: Control, lr: jnp.ndarray,
            use_line_search: bool = True, tau: float = 0.5,
            c_armijo: float = 1e-4, lr_min: float = 1e-6,
            max_ls_iters: int = 80) -> GDStepResult:
    """One full gradient-descent iteration (``OCP_dolfin.py:309-450``),
    including the Armijo backtracking line search as a lax.while_loop.

    Reference semantics kept: LR is NOT reset between outer iterations
    (caller passes the running LR back in); the accepted line-search state
    is discarded (the next outer iteration re-solves); J is recorded with
    the OLD u_values and the NEW control.
    """
    fwd = forward(prob, f.quad)
    z = solve_adjoint(prob, fwd)
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
            res = forward(prob, f_ls)
            j_new = cost(prob, res.u_values, f_ls)
            accept = (j_old - j_new) >= lr_ * cond_thresh  # (:413)
            return (~accept) & (it < max_ls_iters)

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
    diverged = (~jnp.isfinite(fwd.newton.residual_norm)) | (~jnp.isfinite(j_rec))
    return GDStepResult(f_new, lr, j_rec, div_u, fwd, z, g, gradj, inner,
                        diverged)
