"""Gen-1 solver classes — the structured API of ``old_dolfinx_files``.

`NavierStokesSolver` ↔ ``solver_classes/Navier_stokes_solver.py`` (C7) and
`ODESolver` ↔ ``solver_classes/ODE_solver.py`` (C6), with the gen-1 method
names and call contracts used by ``old_dolfinx_files/main.py:197-227``:

    w_r   = ns.solve_stokes_step(q)
    w     = ns.state_solving_step(q, u_r, i)
    x     = ode.ode_solving_step(u)
    lam_2 = ode.adjoint_ode_solving_step(u)
    w_adj, J, u_vals = ns.adjoint_state_solving_step(u, lam_2, x, h, u_d, q, u_r)

Gen-1 semantics kept: tanh-regularized backflow stabilization with δ from
config, viscous adjoint, J = tracking + (α/2)∫|q|²ds with NO α·K rescaling,
implicit adjoint ODE (I − h∇uᵀ)λ_k = λ_{k+1} − h∇uᵀ(u_d[k] − u(x_k)) with
∇u and u evaluated at x[k] (``ODE_solver.py:123-151``), Newton rtol 1e-10
(``Navier_stokes_solver.py:149-160``).

Deviation (documented): gen-1 interpolates ∇u nodally into P1 via dolfinx
(value from an arbitrary owning cell at inter-element vertices); we use the
L2 projection — smoother and deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import control as ctrl_mod
from ..adjoint import point_source_rhs
from ..fem import assemble
from ..fem.assemble import Operator, scatter_vector
from ..fem.spaces import TaylorHoodSpace, BoundaryQuad
from ..ode import solve_primal_ode
from ..solve import newton_solve, solve_operator, GradProjector
from . import forms as g1


class NavierStokesSolver:
    """Gen-1 Navier–Stokes solver facade over the TPU-native kernels."""

    def __init__(self, space: TaylorHoodSpace, bq: BoundaryQuad,
                 bc_dofs, bc_vals, viscosity: float = 1.0,
                 alpha: float = 1e-2, delta: float = 0.1):
        self.space = space
        self.bq = bq
        self.bc_dofs = bc_dofs
        self.bc_vals = bc_vals
        self.viscosity = viscosity
        self.alpha = alpha
        self.delta = delta            # ψ_δ regularization width (:65-75)
        self.projector = GradProjector.build(space)

    # -- forms ------------------------------------------------------------
    def _residual(self, w, q_quad):
        space = self.space
        wl = w[space.cell_dofs_mixed]
        cell_r = jax.vmap(
            lambda wl_, ji, dj: g1.gen1_ns_cell_residual(
                space, wl_, ji, dj, self.viscosity)
        )(wl, space.cell_jinv, space.cell_detj)
        r = scatter_vector(space.ndof, space.cell_dofs_mixed, cell_r)
        bq = self.bq
        fdofs = space.cell_dofs_mixed[bq.cells]
        facet_r = jax.vmap(
            lambda wl_, ph, nrm, wt, qv: g1.gen1_ns_facet_residual(
                wl_, ph, nrm, wt, qv, self.delta)
        )(w[fdofs], bq.phi2, bq.normals, bq.weights, q_quad)
        return r.at[fdofs].add(facet_r)

    def _operator(self, w):
        space, bq = self.space, self.bq
        wl = w[space.cell_dofs_mixed]
        cell_jac = jax.vmap(jax.jacfwd(
            lambda wl_, ji, dj: g1.gen1_ns_cell_residual(
                space, wl_, ji, dj, self.viscosity))
        )(wl, space.cell_jinv, space.cell_detj)
        fdofs = space.cell_dofs_mixed[bq.cells]
        facet_mats = jax.vmap(jax.jacfwd(
            lambda wl_, ph, nrm, wt: g1.gen1_ns_facet_residual(
                wl_, ph, nrm, wt, None, self.delta))
        )(w[fdofs], bq.phi2, bq.normals, bq.weights)
        return Operator(cell_jac, space.cell_dofs_mixed, facet_mats, fdofs,
                        self.bc_dofs, space.ndof)

    # -- gen-1 API ----------------------------------------------------------
    def state_solving_step(self, q: ctrl_mod.Control, u_r=None,
                           opt_step: int = 0):
        """Nonlinear NS Newton solve (``Navier_stokes_solver.py:140-171``;
        rtol 1e-10). Asserts convergence like the gen-1 ``assert``."""
        res = newton_solve(
            lambda w: self._residual(w, q.quad), self._operator,
            jnp.zeros(self.space.ndof), self.bc_dofs, self.bc_vals,
            rtol=1e-10)
        assert bool(res.converged), "gen-1 Newton did not converge"
        return res.w

    def solve_stokes_step(self, q: ctrl_mod.Control):
        """Linear Stokes warm-up solve (``:299-319``; gen-1 used
        BCGS+Jacobi — here the same mixed-precision direct solver)."""
        space = self.space
        w0 = jnp.zeros(space.ndof)
        op = assemble.ns_operator(space, None, w0, self.viscosity,
                                  self.bc_dofs, convection=False)
        b = assemble.boundary_load(space, self.bq, q.quad)
        return solve_operator(op, b, self.bc_vals)

    def adjoint_state_solving_step(self, u, lam_2, x, h, u_d,
                                   q: ctrl_mod.Control, u_r=None):
        """Adjoint solve with scifem-style point sources
        (``Navier_stokes_solver.py:173-267``). Returns (w_adj, J, u_vals).
        γ = h(u_d − u(x) + λ₂); J uses α/2 with no K rescaling (``:250-253``).
        """
        space, bq = self.space, self.bq
        K = x.shape[0]
        w_bg = jnp.concatenate([jnp.asarray(u).reshape(-1),
                                jnp.zeros(space.n_p1)])
        wl = w_bg[space.cell_dofs_mixed]
        cell_jac = jax.vmap(jax.jacfwd(
            lambda zl, wl_, ji, dj: g1.gen1_adjoint_cell_residual(
                space, zl, wl_, ji, dj, self.viscosity))
        )(wl * 0.0, wl, space.cell_jinv, space.cell_detj)
        fdofs = space.cell_dofs_mixed[bq.cells]
        facet_mats = jax.vmap(jax.jacfwd(
            lambda zl, wl_, ph, nrm, wt: g1.gen1_adjoint_facet_residual(
                zl, wl_, ph, nrm, wt, self.delta))
        )(w_bg[fdofs] * 0.0, w_bg[fdofs], bq.phi2, bq.normals, bq.weights)
        op = Operator(cell_jac, space.cell_dofs_mixed, facet_mats, fdofs,
                      self.bc_dofs, space.ndof)

        center = jnp.asarray([0.5, 0.5])
        b = point_source_rhs(space, jnp.asarray(u), x, lam_2, u_d,
                             jnp.zeros(K, bool), h, center)
        w_adj = solve_operator(op, b, self.bc_vals)

        from ..fem.interpolate import eval_velocity
        u_vals, _ = eval_velocity(space, jnp.asarray(u), x)
        part_a = 0.5 * float(jnp.sum(
            h * jnp.sum((u_vals - u_d) ** 2, axis=-1)))
        e = float(ctrl_mod.boundary_l2_sq(bq, q))
        J = part_a + 0.5 * self.alpha * e
        return w_adj, J, np.asarray(u_vals)


class ODESolver:
    """Gen-1 buoy ODE facade (``solver_classes/ODE_solver.py``)."""

    def __init__(self, space: TaylorHoodSpace, K: int, t0=0.0, T=1.0,
                 dt=0.005, center=(0.5, 0.5)):
        self.space = space
        self.K = K
        self.h = dt
        self.nt = int(T / dt)
        self.time_interval = np.linspace(t0, T, self.nt)
        self.center = jnp.asarray(center)
        # gen-1 measurement synthesis (ODE_solver.py:75-90)
        ud1 = 0.5 * (np.cos(np.pi * (self.time_interval - 0.5)) - 1
                     - np.cos(np.pi))
        self.u_d = np.zeros((K, self.nt, 2))
        self.u_d[:, :, 0] = ud1
        # seeds (ODE_solver.py:97-99)
        self.x0 = jnp.asarray(np.stack(
            [np.full(K, 0.2), np.linspace(0.2, 0.9, K)], axis=1))
        self.projector = GradProjector.build(space)
        self.x = None

    def ode_solving_step(self, u) -> np.ndarray:
        """Explicit Euler (``:101-121``). Gen-1 exits on a failed point
        location; we raise instead."""
        ode = solve_primal_ode(self.space, jnp.asarray(u), self.x0, self.h,
                               self.nt, self.center)
        if bool(ode.mask.any()):
            raise RuntimeError("no colliding cells (buoy left the domain)")
        self.x = ode.x
        return np.asarray(ode.x)

    def adjoint_ode_solving_step(self, u) -> np.ndarray:
        """Implicit recursion (I − h∇uᵀ)λ_k = λ_{k+1} − h∇uᵀ(u_d[k] − u(x_k))
        with ∇u and u at x[k] (``:123-151``)."""
        from ..fem.interpolate import eval_p1_tensor, eval_velocity
        assert self.x is not None, "run ode_solving_step first"
        u = jnp.asarray(u)
        grad_u = self.projector.project(self.space, u)
        nt = self.nt

        def one_buoy(x_b, ud_b):
            def step(lam_next, k):
                g, _ = eval_p1_tensor(self.space, grad_u, x_b[k])
                uv, _ = eval_velocity(self.space, u, x_b[k])
                a = jnp.eye(2) - self.h * g.T
                rhs = lam_next - self.h * g.T @ (ud_b[k] - uv)
                det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
                inv = jnp.array([[a[1, 1], -a[0, 1]],
                                 [-a[1, 0], a[0, 0]]]) / det
                lam = inv @ rhs
                return lam, lam

            zero_b = x_b[0, 0] * 0.0
            init = jnp.zeros(2) + zero_b
            _, lams = jax.lax.scan(
                step, init, jnp.arange(nt - 2, -1, -1, dtype=jnp.int32))
            return jnp.concatenate([lams[::-1], jnp.zeros((1, 2))])

        return np.asarray(jax.vmap(one_buoy)(
            self.x, jnp.asarray(self.u_d)))
