"""Geometric two-grid block preconditioning for the saddle-point solves.

The mesh-robust scaling path past dense-LU territory. The reference scales
``unit_square_resolution`` freely because PETSc's sparse CPU LU does
(``OCP_dolfin.py:28-30,325,371``); on TPU the blocked dense LU caps at
~21k mixed dofs (Nx≈48, see ``system.LARGE_SOLVE_COMPILER_OPTIONS``). This
module removes that cap with a TPU-first design:

  FGMRES on the exact float64 matrix-free mixed operator,
  right-preconditioned by the Elman–Silvester–Wathen block-triangular
  preconditioner

      P = [[Â, Bᵀ], [0, Ŝ]],   Ŝ ≈ pressure Schur complement,

  where Ŝ is the ν-scaled lumped pressure mass (the classical Stokes
  approximation, mesh-independent) and Â⁻¹ is ONE geometric two-grid
  V-cycle on the P2 velocity block: damped-Jacobi smoothing on the fine
  grid, exact coarse solve through the MXU-friendly fp32 dense LU on the
  half-resolution mesh — which is back inside dense-LU territory, so the
  hierarchy never needs more than one level (Nx=128 → coarse Nx=64 still
  factorizes with the raised scoped-VMEM limit).

Transfers are generic FE interpolation between any two meshes of the same
domain (built once, host-side, through the O(1) structured-grid locator),
so the coarse grid does not need to be nested — odd resolutions and the
L-shape staircase coarsen fine.

Everything on the device path is jit-compatible: the V-cycle is unrolled
Jacobi sweeps + one ``solve32`` + two static gather/scatter transfers, and
the Newton loop is the same ``lax.while_loop`` shape as ``newton_solve``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assemble import Operator, apply_bc_vector
from ..fem.spaces import TaylorHoodSpace, BoundaryQuad
from ..mesh.locate import locate_points
from ..fem import reference as ref
from ..ops import linalg
from ..ops.ell import ELLTables, build_ell_tables, ell_matvec_fn
from . import krylov
from .newton import NewtonResult


# ---------------------------------------------------------------------------
# velocity sub-block of a mixed operator
# ---------------------------------------------------------------------------

def velocity_block(op: Operator, n_vel: int) -> Operator:
    """The (2·n_p2 × 2·n_p2) velocity block of a mixed operator, as an
    `Operator` (local velocity dofs are columns 0..11 of the mixed element
    matrices; Dirichlet dofs are velocity dofs already)."""
    facet_mats = facet_dofs = None
    if op.facet_mats is not None:
        facet_mats = op.facet_mats[:, :12, :12]
        facet_dofs = op.facet_dofs[:, :12]
    return Operator(op.cell_mats[:, :12, :12], op.cell_dofs[:, :12],
                    facet_mats, facet_dofs, op.bc_dofs, n_vel)


# ---------------------------------------------------------------------------
# inter-mesh interpolation tables (host-side, one-time)
# ---------------------------------------------------------------------------

def _clamp_to_domain(loc, points: np.ndarray) -> np.ndarray:
    """Snap points onto the analytic domain of ``loc`` — staircase meshes
    (e.g. the L-shape at resolutions where the inner corner is not a grid
    line) carry boundary dofs up to one cell outside the other grid's
    analytic domain; snapping moves them ≤ one mesh width, an O(h)
    perturbation of a few near-boundary transfer rows only."""
    xmin, ymin, xmax, ymax = loc.extent
    p = np.clip(np.asarray(points, dtype=np.float64),
                [xmin, ymin], [xmax, ymax])
    if loc.domain == "lshape":
        cx, cy = loc.lshape_corner
        notch = (p[:, 0] < cx) & (p[:, 1] > cy)
        p[notch, 1] = cy
    return p


def _p2_interpolation_table(space_src: TaylorHoodSpace, points: np.ndarray):
    """Tables (dofs (n,6), weights (n,6)) such that a P2 field's value at
    ``points[i]`` is ``Σ_a w[i,a]·u[dofs[i,a]]`` (exact for P2 fields)."""
    points = _clamp_to_domain(space_src.locator, points)
    cell, xi, inside = locate_points(space_src.locator, jnp.asarray(points))
    assert bool(jnp.all(inside)), "interpolation point outside source mesh"
    w = ref.p2_basis(np.asarray(xi))
    dofs = np.asarray(space_src.cell_dofs_p2)[np.asarray(cell)]
    return (jnp.asarray(dofs, dtype=jnp.int32), jnp.asarray(w))


def _interp(dofs: jnp.ndarray, w: jnp.ndarray, vals: jnp.ndarray
            ) -> jnp.ndarray:
    """Apply an interpolation table: (n_src, k…) → (n_dst, k…)."""
    return jnp.einsum("ia,ia...->i...", w, vals[dofs])


def _interp_t(dofs: jnp.ndarray, w: jnp.ndarray, vals: jnp.ndarray,
              n_out: int) -> jnp.ndarray:
    """Transpose (scatter-add) application: restriction of dual vectors."""
    out = jnp.zeros((n_out,) + vals.shape[1:], vals.dtype)
    return out.at[dofs].add(jnp.einsum("ia,i...->ia...", w, vals))


# ---------------------------------------------------------------------------
# two-grid context
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MGContext:
    """Everything the two-grid preconditioner needs besides the fine
    operator: the coarse problem tables and the transfer tables."""

    space_c: TaylorHoodSpace
    bq_c: Optional[BoundaryQuad]
    bc_dofs_c: jnp.ndarray
    # prolongation: coarse P2 → fine P2 (per scalar dof)
    pro_dofs: jnp.ndarray          # (n_f2, 6) coarse scalar P2 dofs
    pro_w: jnp.ndarray             # (n_f2, 6)
    # state injection: fine P2 → coarse P2 (for assembling the coarse
    # operator at the current Newton state)
    inj_dofs: jnp.ndarray          # (n_c2, 6) fine scalar P2 dofs
    inj_w: jnp.ndarray             # (n_c2, 6)
    pm_inv: jnp.ndarray            # (n_f1,) Ŝ⁻¹ = ν / lumped pressure mass
    nu: float
    # scatter-free ELL incidence tables for the fine mixed operator and
    # its velocity block (ops/ell.py); None → element scatter matvecs
    ell_mixed: Optional[ELLTables] = None
    ell_vel: Optional[ELLTables] = None
    # precomputed f32 inverse of the coarse Stokes velocity block
    # (ops/linalg.py::explicit_inverse_host, built once per problem):
    # the vcycle's coarse solve becomes one MXU matmul, and no program
    # ever materializes an in-jit inversion (whose XLA TriangularSolve
    # demands ~n/256 RHS copies — 104 GB at the Nx=96 coarse grid)
    ainv_c: Optional[jnp.ndarray] = None
    # --- multi-LEVEL extension (Nx≥192, where even the half-resolution
    # coarse velocity block no longer fits a dense inverse): when
    # ``ainv_c`` is None and ``sub`` is set, the coarse correction is
    # itself a recursive V-cycle — Jacobi smoothing on ``op_vel_c`` (the
    # FROZEN Stokes velocity block at this context's coarse level; the
    # whole preconditioner hierarchy is frozen at w0=0 already, so every
    # level below the finest is problem-constant) with ``sub`` describing
    # the next coarser transfer/solve. The chain ends at a context whose
    # ``ainv_c`` is the explicit inverse of a small-enough block.
    op_vel_c: Optional[Operator] = None
    sub: Optional["MGContext"] = None
    # offset-stencil matvec tables for THIS context's FINE space
    # (ops/stencil.py) — the structured-grid fast path replacing the
    # element scatter matvec in every Krylov/smoother application. None →
    # scatter matvecs (mg_matvec="scatter" or table build failure).
    st_mixed: Optional[object] = None
    st_vel: Optional[object] = None

    def tree_flatten(self):
        return ((self.space_c, self.bq_c, self.bc_dofs_c, self.pro_dofs,
                 self.pro_w, self.inj_dofs, self.inj_w, self.pm_inv,
                 self.ell_mixed, self.ell_vel, self.ainv_c,
                 self.op_vel_c, self.sub, self.st_mixed, self.st_vel),
                (self.nu,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        (*head, ell_mixed, ell_vel, ainv_c, op_vel_c, sub,
         st_mixed, st_vel) = children
        return cls(*head, *aux, ell_mixed=ell_mixed, ell_vel=ell_vel,
                   ainv_c=ainv_c, op_vel_c=op_vel_c, sub=sub,
                   st_mixed=st_mixed, st_vel=st_vel)


def build_mg_context(space_f: TaylorHoodSpace, space_c: TaylorHoodSpace,
                     bq_c: Optional[BoundaryQuad], bc_dofs_c: jnp.ndarray,
                     nu: float, bq_f: Optional[BoundaryQuad] = None,
                     bc_dofs_f=None, use_ell: bool = False,
                     use_stencil: bool = True) -> MGContext:
    """Build the transfer tables between an existing fine and coarse space
    (both over the same domain; the coarse mesh need not be nested).

    ``use_ell=True`` additionally builds scatter-free ELL incidence tables
    for the fine mixed operator and its velocity block (ops/ell.py) — an
    alternative matvec for contexts where scatter is the bottleneck.
    Measured on TPU v5e at Nx=64 the element scatter matvec is FASTER
    (4.5 ms vs 31 ms: the (n, ~92) row gather doesn't vectorize), so the
    default Krylov path keeps scatter matvecs and ELL is opt-in."""
    pro_dofs, pro_w = _p2_interpolation_table(
        space_c, np.asarray(space_f.dof_coords_p2))
    inj_dofs, inj_w = _p2_interpolation_table(
        space_f, np.asarray(space_c.dof_coords_p2))
    pm = krylov.pressure_mass_lumped(space_f, nu)
    ell_mixed = ell_vel = None
    if use_ell and bq_f is not None and bc_dofs_f is not None:
        cd = np.asarray(space_f.cell_dofs_mixed)
        fd = cd[np.asarray(bq_f.cells)]          # assemble.py facet layout
        bc_np = np.asarray(bc_dofs_f)
        ell_mixed = build_ell_tables(cd, fd, space_f.ndof, bc_np)
        ell_vel = build_ell_tables(cd[:, :12], fd[:, :12],
                                   2 * space_f.n_p2, bc_np)
    st_mixed = st_vel = None
    if use_stencil:
        from ..ops import stencil as _stencil
        try:
            st_mixed = _stencil.build_stencil_tables(space_f, bq_f, "mixed")
            st_vel = _stencil.build_stencil_tables(space_f, bq_f, "vel")
        except (ValueError, AssertionError):
            st_mixed = st_vel = None        # fall back to scatter matvecs
    return MGContext(space_c=space_c, bq_c=bq_c, bc_dofs_c=bc_dofs_c,
                     pro_dofs=pro_dofs, pro_w=pro_w,
                     inj_dofs=inj_dofs, inj_w=inj_w,
                     pm_inv=1.0 / pm, nu=nu,
                     ell_mixed=ell_mixed, ell_vel=ell_vel,
                     st_mixed=st_mixed, st_vel=st_vel)


def inject_state(mg: MGContext, space_f: TaylorHoodSpace,
                 w_f: jnp.ndarray) -> jnp.ndarray:
    """Sample a fine mixed state's velocity at the coarse P2 dof coordinates
    → a coarse mixed state (pressure 0; only the velocity enters the
    convection terms of the Jacobian)."""
    u_f, _ = space_f.split(w_f)
    u_c = _interp(mg.inj_dofs, mg.inj_w, u_f)           # (n_c2, 2)
    return mg.space_c.join(u_c, jnp.zeros(mg.space_c.n_p1))


# ---------------------------------------------------------------------------
# the preconditioner
# ---------------------------------------------------------------------------

def op_matvec(op: Operator, dtype=jnp.float64
              ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Matrix-free operator application at a chosen precision. float32 is
    the TPU-native fast path (the f64 einsums are software-emulated); the
    element matrices are cast once at closure build time."""
    cm = op.cell_mats.astype(dtype)
    fm = None if op.facet_mats is None else op.facet_mats.astype(dtype)

    def mv(x):
        y = jnp.zeros(op.n, dtype).at[op.cell_dofs].add(
            jnp.einsum("cab,cb->ca", cm, x[op.cell_dofs]))
        if fm is not None:
            y = y.at[op.facet_dofs].add(
                jnp.einsum("fab,fb->fa", fm, x[op.facet_dofs]))
        return y.at[op.bc_dofs].set(x[op.bc_dofs])

    return mv


def _stencil_or_scatter(st, op: Operator, dtype) -> Callable:
    """Operator application: offset-stencil form when tables exist
    (ops/stencil.py — ~100× less traffic than the element scatter on
    structured grids), element scatter otherwise."""
    if st is not None:
        from ..ops import stencil as _stencil
        return _stencil.matvec_of(st, dtype)(op)
    return op_matvec(op, dtype)


def _jacobi_dinv(vel_op: Operator, omega: float, dtype) -> jnp.ndarray:
    d = krylov.operator_diagonal(vel_op)
    return (omega / jnp.where(jnp.abs(d) > 1e-30, d, 1.0)).astype(dtype)


def _make_vcycle(mg: MGContext, vel_mv: Callable, dinv: jnp.ndarray,
                 bc_f: jnp.ndarray, dtype, omega: float, pre: int,
                 post: int, coarse_solve: Callable) -> Callable:
    """One V-cycle on a level's velocity block: ``pre`` damped-Jacobi
    sweeps, coarse correction through ``coarse_solve`` over the transfer
    tables of ``mg``, ``post`` sweeps."""
    pro_w = mg.pro_w.astype(dtype)
    bc_c = mg.bc_dofs_c

    def vcycle(r):                                    # r: (n_vel,)
        e = dinv * r
        for _ in range(pre - 1):
            e = e + dinv * (r - vel_mv(e))
        # coarse correction (transfers act on (n_p2, 2) velocity fields)
        res = (r - vel_mv(e)).reshape(-1, 2)
        rc = _interp_t(mg.pro_dofs, pro_w, res,
                       mg.space_c.n_p2).reshape(-1)
        rc = rc.at[bc_c].set(0.0)
        ec = coarse_solve(rc)
        ef = _interp(mg.pro_dofs, pro_w, ec.reshape(-1, 2)).reshape(-1)
        ef = ef.at[bc_f].set(0.0)
        e = e + ef
        for _ in range(post):
            e = e + dinv * (r - vel_mv(e))
        return e

    return vcycle


def _coarse_solver(mg: MGContext, dtype, omega: float, pre: int,
                   post: int) -> Optional[Callable]:
    """The coarse-correction solve of a context: an explicit-inverse MXU
    matmul at the leaf, or a recursive V-cycle on the frozen coarse
    velocity block when the hierarchy continues (``mg.sub``). Returns None
    when neither table exists (legacy in-program-inverse contexts)."""
    if mg.ainv_c is not None:
        ainv_c = mg.ainv_c
        return lambda rc: (ainv_c @ rc.astype(jnp.float32)).astype(dtype)
    if mg.sub is not None:
        assert mg.op_vel_c is not None, (
            "multi-level context needs the frozen coarse velocity operator")
        dinv_c = _jacobi_dinv(mg.op_vel_c, omega, dtype)
        mv_c = _stencil_or_scatter(mg.sub.st_vel, mg.op_vel_c, dtype)
        sub_solve = _coarse_solver(mg.sub, dtype, omega, pre, post)
        return _make_vcycle(mg.sub, mv_c, dinv_c, mg.bc_dofs_c, dtype,
                            omega, pre, post, sub_solve)
    return None


def make_block_preconditioner(mg: MGContext, space_f: TaylorHoodSpace,
                              op_mixed: Operator,
                              op_mixed_c: Optional[Operator] = None,
                              omega: float = 0.6, pre: int = 2,
                              post: int = 2, dtype=jnp.float64,
                              nu_scale: float = 1.0,
                              coarse_krylov: int = 0
                              ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build M ≈ P⁻¹ from a (possibly frozen) fine mixed operator and the
    context's coarse hierarchy.

      M(r): p = −Ŝ⁻¹ r_p;  u = V-cycle_Â(r_u − Bᵀp);  return (u, p)

    The V-cycle smooths with damped Jacobi on the fine velocity block; the
    coarse correction is an explicit-inverse matmul (two-grid leaf) or a
    recursive V-cycle over ``mg.sub`` (multi-level, Nx≥192). ``dtype``
    sets the preconditioner arithmetic — float32 feeds the
    mixed-precision FGMRES production path.

    ``nu_scale`` = (rung ν) / (hierarchy ν): the frozen coarse tables are
    ν-linear Stokes velocity blocks (w0=0 ⇒ the block is exactly
    ν·stiffness + identity BC rows, and BC residual rows are zeroed in
    the cycle), so a viscosity-continuation rung at ν_k reuses the
    ν-target hierarchy EXACTLY by scaling the coarse correction by
    1/nu_scale and the Schur term by nu_scale (``system._solve_ns``). ``op_mixed_c`` (the coarse
    assembly of the same form) is only needed by legacy contexts carrying
    neither ``ainv_c`` nor ``sub``: there the coarse velocity block is
    inverted in-program (+1 Newton–Schulz step — the raw f32 inverse left
    the ill-conditioned L-shape Newton stalled at 1.3e-8).

    ``coarse_krylov`` > 0 (the convection-dominated re-freeze, VERDICT r2
    item 9): the frozen Stokes coarse solve is demoted to the
    PRECONDITIONER of a short inner FGMRES on ``op_mixed_c``'s velocity
    block — the coarse operator assembled at the caller's linearization
    state. At ν=0.01 the coarse Stokes correction misses the dominant
    convection entirely (measured: warm-started Newton at Nx=64 stalls at
    residual 3.6e-2 within 50 iterations); ~a dozen Stokes-preconditioned
    Krylov iterations on the actual coarse Oseen block restore a
    convection-aware coarse correction at a few extra coarse matvecs +
    leaf applications per V-cycle. 0 = off (the ν=1 default paths are
    bit-identical). Requires ``op_mixed_c`` when nonzero; applies only to
    frozen-hierarchy contexts (``ainv_c``/``sub``)."""
    n_vel = 2 * space_f.n_p2
    vel_f = velocity_block(op_mixed, n_vel)
    dinv = _jacobi_dinv(vel_f, omega, dtype)
    # offset-stencil matvecs when the context carries tables (the
    # structured-grid fast path); element scatter otherwise — itself
    # measured FASTER than the ELL gather tables on TPU at Nx=64 (4.5 ms
    # vs 31 ms). ELL stays available for sharded callers.
    vel_mv = _stencil_or_scatter(mg.st_vel, vel_f, dtype)
    mixed_mv = _stencil_or_scatter(mg.st_mixed, op_mixed, dtype)

    # coarse solve as ONE f32 matmul (measured: the blocked triangular
    # lu_solve dominated the 145 ms preconditioner application; the
    # matmul form runs the 60-iteration FGMRES restart 10× faster). The
    # inverse is a *preconditioner* component — f32 inversion error only
    # costs Krylov iterations, never solution accuracy. Preferred source:
    # the problem-constant precomputed mg.ainv_c (built host-side once,
    # ops/linalg.py::explicit_inverse_host — in-jit jnp.linalg.inv OOMs
    # HBM past ~10k because XLA's TriangularSolve keeps ~n/256 RHS
    # copies), or the recursive multi-level V-cycle (mg.sub).
    coarse_solve = _coarse_solver(mg, dtype, omega, pre, post)
    # nu_scale may be a traced scalar (the staged runner's single
    # continuation-rung program, system.solve_ns_rung); only skip the
    # scaling multiply for the static-1.0 fast path
    static_one = isinstance(nu_scale, float) and nu_scale == 1.0
    if coarse_solve is not None and not static_one:
        inner_solve = coarse_solve
        coarse_solve = lambda rc: inner_solve(rc) * (
            1.0 / jnp.asarray(nu_scale, jnp.float32))
    if coarse_solve is not None and coarse_krylov > 0:
        assert op_mixed_c is not None, (
            "coarse_krylov needs the state-assembled coarse operator")
        vel_c = velocity_block(op_mixed_c, 2 * mg.space_c.n_p2)
        mv_c = _stencil_or_scatter(
            mg.sub.st_vel if mg.sub is not None else None, vel_c,
            jnp.float32)
        stokes_solve = coarse_solve

        def coarse_solve(rc):
            sol = krylov.fgmres(
                mv_c, rc.astype(jnp.float32),
                M=lambda v: stokes_solve(v).astype(jnp.float32),
                restart=coarse_krylov, max_restarts=1, tol=1e-3)
            return sol.x.astype(dtype)
    if coarse_solve is None:
        assert op_mixed_c is not None, (
            "a context without ainv_c/sub needs the coarse mixed operator")
        vel_c = velocity_block(op_mixed_c, 2 * mg.space_c.n_p2)
        a_c = vel_c.dense()
        ainv_c = jnp.linalg.inv(a_c)
        ainv_c = ainv_c + ainv_c @ (
            jnp.eye(a_c.shape[0], dtype=a_c.dtype) - a_c @ ainv_c)
        coarse_solve = (
            lambda rc: (ainv_c @ rc.astype(jnp.float32)).astype(dtype))

    bc_f = op_mixed.bc_dofs
    pm_inv = (mg.pm_inv * nu_scale).astype(dtype)
    vcycle = _make_vcycle(mg, vel_mv, dinv, bc_f, dtype, omega, pre, post,
                          coarse_solve)

    def M(r):
        ru, rp = r[:n_vel], r[n_vel:]
        p = -pm_inv * rp
        # Bᵀp through the mixed matvec of (0, p): the gradient block is
        # state-independent, so the frozen operator is exact here
        btp = mixed_mv(jnp.concatenate([jnp.zeros(n_vel, dtype), p]))[:n_vel]
        u = vcycle(ru - btp)
        return jnp.concatenate([u, p])

    return M


# ---------------------------------------------------------------------------
# solves
# ---------------------------------------------------------------------------

class MGSolveResult(NamedTuple):
    x: jnp.ndarray
    residual_norm: jnp.ndarray
    iterations: jnp.ndarray        # FGMRES restart cycles
    converged: jnp.ndarray


def solve_operator_mg(op: Operator, op_c: Optional[Operator], mg: MGContext,
                      space_f: TaylorHoodSpace, b: jnp.ndarray,
                      bc_vals: jnp.ndarray, tol: float = 1e-11,
                      restart: int = 60, max_restarts: int = 4,
                      inner_tol: float = 1e-6, max_rounds: int = 4,
                      matvec_of: Callable = None,
                      pre: int = 2, post: int = 2,
                      coarse_krylov: int = 0,
                      nu_scale: float = 1.0) -> MGSolveResult:
    """Mesh-robust replacement for the dense ``solve_operator`` (adjoint NS
    solve, ``OCP_dolfin.py:371``): mixed-precision FGMRES + two-grid block
    preconditioner.

    TPU-first precision design (same recipe as the dense path's fp32 LU +
    fp64 refinement, ``ops/linalg.py``): the Krylov iteration runs in
    NATIVE float32 (matvec, Gram–Schmidt, preconditioner — the fp64
    equivalents are software-emulated and ~10× slower on TPU); full fp64
    accuracy is recovered by outer iterative-refinement rounds whose
    residuals use the exact fp64 matvec. Each round contracts the fp64
    residual by ~``inner_tol``.

    ``op_c`` must be the coarse assembly of the SAME bilinear form — only
    needed (and only used) by legacy contexts carrying neither ``ainv_c``
    nor ``sub``; pass None otherwise and skip the coarse assembly.
    ``matvec_of`` (op → matvec) lets multi-chip callers swap in a
    dof-sharded operator application (parallel/dof_sharding.py).

    ``nu_scale`` = (operator's effective viscosity) / (hierarchy ν) — the
    rung-scaling mechanism of ``make_block_preconditioner``. The ADJOINT
    operator carries a UNIT Laplacian regardless of the config ν (the
    reference quirk, ``OCP_dolfin.py:344``; ``forms.adjoint_cell_residual``
    reproduces it), so adjoint callers at ν≠1 MUST pass 1/ν: the frozen
    hierarchy is assembled at ν, and the un-scaled coarse correction /
    Schur term are each off by 1/ν — at ν=0.01 that 100× mismatch stalled
    the staged adjoint at rel res 5.2e-6 (round-3 r3j tail)."""
    b = apply_bc_vector(b, op.bc_dofs, bc_vals)
    M32 = make_block_preconditioner(mg, space_f, op, op_c,
                                    dtype=jnp.float32, pre=pre, post=post,
                                    coarse_krylov=coarse_krylov,
                                    nu_scale=nu_scale)
    if matvec_of is not None:
        mv64 = matvec_of(op)
        mv32 = op_matvec(op, jnp.float32)
    else:
        mv64 = (op.matvec64 if mg.st_mixed is None
                else _stencil_or_scatter(mg.st_mixed, op, jnp.float64))
        mv32 = _stencil_or_scatter(mg.st_mixed, op, jnp.float32)

    bnorm = jnp.linalg.norm(b)
    target = tol * jnp.maximum(bnorm, 1e-300)

    def cond(state):
        x, rnorm, it, inner = state
        return (rnorm > target) & (it < max_rounds)

    def body(state):
        x, rnorm, it, inner = state
        r = b - mv64(x)
        sol = krylov.fgmres(mv32, r.astype(jnp.float32), M=M32,
                            restart=restart, max_restarts=max_restarts,
                            tol=inner_tol)
        x = x + sol.x.astype(jnp.float64)
        return (x, jnp.linalg.norm(b - mv64(x)), it + 1,
                inner + sol.iterations)

    x0 = jnp.zeros_like(b)
    x, rnorm, rounds, inner = jax.lax.while_loop(
        cond, body, (x0, bnorm, jnp.asarray(0), jnp.asarray(0)))
    return MGSolveResult(x, rnorm, inner, rnorm <= target)


def newton_solve_mg(residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
                    operator_fn: Callable[[jnp.ndarray], Operator],
                    coarse_operator_fn: Optional[Callable[[jnp.ndarray],
                                                          Operator]],
                    mg: MGContext, space_f: TaylorHoodSpace,
                    w0: jnp.ndarray, bc_dofs: jnp.ndarray,
                    bc_vals: jnp.ndarray,
                    rtol: float = 1e-9, atol: float = 1e-10,
                    max_iter: int = 50, step_tol: float = 1e-6,
                    restart: int = 60, max_restarts: int = 4,
                    polish: int = 1,
                    matvec_of: Callable = None,
                    pre: int = 2, post: int = 2,
                    nu_scale: float = 1.0,
                    coarse_krylov: int = 0) -> NewtonResult:
    """BC-aware Newton with FGMRES linear steps (same convergence criteria
    as ``newton_solve``; drop-in past the dense-LU resolution cap).

    The block preconditioner is built ONCE at w0 (for the standard w0 = 0,
    a Stokes preconditioner) and reused for every Newton step — staleness
    only costs Krylov iterations, never accuracy, since each step's matvec
    is the exact current Jacobian and the convergence test is the exact
    fp64 residual (mirrors the ``reuse_factorization`` trade of
    ``solve/newton.py`` without its divergence risk).

    Precision: each Newton step's FGMRES runs in native float32 (a
    ~``step_tol``-accurate direction is all a Newton step needs — the
    fp32-LU dense path makes the identical trade) and the Newton loop's
    own exact-fp64 residual test acts as the refinement loop. After the
    tolerance test passes, ``polish`` extra correction steps push the
    residual well below it (each contracts by ~step_tol), matching the
    dense path's incidental overshoot so downstream parity holds at
    1e-9 in w."""

    def bc_residual(w):
        r = residual_fn(w)
        return r.at[bc_dofs].set(w[bc_dofs] - bc_vals)

    op0 = operator_fn(w0)
    op0_c = (coarse_operator_fn(w0) if coarse_operator_fn is not None
             else None)
    M32 = make_block_preconditioner(mg, space_f, op0, op0_c,
                                    dtype=jnp.float32, pre=pre, post=post,
                                    nu_scale=nu_scale,
                                    coarse_krylov=coarse_krylov)

    r0 = bc_residual(w0)
    r0norm = jnp.linalg.norm(r0)

    def cond(state):
        w, r, rnorm, it = state
        not_conv = (rnorm > atol) & (rnorm > rtol * r0norm)
        return not_conv & (it < max_iter)

    def make_body(tol):
        def body(state):
            w, r, rnorm, it = state
            op = operator_fn(w)
            if matvec_of is None:
                mv32 = _stencil_or_scatter(mg.st_mixed, op, jnp.float32)
            else:
                mv32 = matvec_of(op)
            sol = krylov.fgmres(mv32, (-r).astype(jnp.float32), M=M32,
                                restart=restart, max_restarts=max_restarts,
                                tol=tol)
            dw = sol.x.astype(jnp.float64)
            # residual-monotone damping, FULL STEP PREFERRED: exact Newton
            # 2-cycles at strong convection (observed on the ν-continuation
            # ladder: residual pinned at 0.1772 for 50 iterations at any
            # Krylov effort); when the full step already reduces ‖r‖ —
            # every ν=1 configuration — the damper is a no-op, so
            # converging trajectories are bit-identical.
            w_c = w + dw
            r_c = bc_residual(w_c)
            n_c = jnp.linalg.norm(r_c)
            accept = n_c < rnorm
            for theta in (0.5, 0.25, 0.125):
                cand = w + theta * dw
                rc2 = bc_residual(cand)
                nc2 = jnp.linalg.norm(rc2)
                take = (~accept) & (nc2 < rnorm)
                w_c = jnp.where(take, cand, w_c)
                r_c = jnp.where(take, rc2, r_c)
                n_c = jnp.where(take, nc2, n_c)
                accept = accept | take
            return (w_c, r_c, n_c, it + 1)
        return body

    w, r, rnorm, it = jax.lax.while_loop(
        cond, make_body(step_tol), (w0, r0, r0norm, jnp.asarray(0)))
    converged = (rnorm <= atol) | (rnorm <= rtol * r0norm)
    # tighter Krylov tolerance in the polish steps (a handful of extra
    # inner iterations, final solve only): keeps the dense-path 1e-9 w
    # parity with a comfortable margin under any f32 matvec rounding
    polish_body = make_body(min(step_tol, 1e-8))
    for _ in range(polish):
        w, r, rnorm, it = polish_body((w, r, rnorm, it))
    return NewtonResult(w, it, rnorm, converged)
