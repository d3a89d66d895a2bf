"""Gen-1 FD-verification and field-evaluation helpers
(``old_dolfinx_files/helper_functions/helper_functions.py``, C10).

The gen-1 testing layer: re-solve the coupled state+ODE system at q ± h·dq
and tabulate |FD − adjoint-gradient| (``:51-179``), including the
RHS-control variant where the control acts as a volume force instead of a
boundary force (``:286-347``), plus batched trajectory evaluation
(``evalutate_fuct``, ``:13-33``) and quiver-plot field sampling
(``eval_vector_field``, ``:350-402``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import control as ctrl_mod
from ..fem.interpolate import eval_velocity
from .solvers import NavierStokesSolver, ODESolver


def evaluate_fct(space, u, points) -> np.ndarray:
    """Batched point evaluation of a velocity field along buoy
    trajectories (``helper_functions.py:13-33``)."""
    vals, _ = eval_velocity(space, jnp.asarray(u), jnp.asarray(points))
    return np.asarray(vals)


def _forward_J(ns: NavierStokesSolver, ode: ODESolver,
               q: ctrl_mod.Control) -> float:
    w = ns.state_solving_step(q)
    u, _ = ns.space.split(w)
    x = ode.ode_solving_step(u)
    u_vals = evaluate_fct(ns.space, u, x)
    part_a = 0.5 * float(np.sum(ode.h * np.sum(
        (u_vals - ode.u_d) ** 2, axis=-1)))
    return part_a + 0.5 * ns.alpha * float(
        ctrl_mod.boundary_l2_sq(ns.bq, q))


def test_gradient(ns: NavierStokesSolver, ode: ODESolver,
                  q: ctrl_mod.Control, dq: ctrl_mod.Control,
                  gradj: float, ks=range(1, 9)):
    """One-sided FD table (``helper_functions.py:51-106``)."""
    j0 = _forward_J(ns, ode, q)
    rows = []
    for k in ks:
        h = 10.0 ** (-k)
        jp = _forward_J(ns, ode, q.axpy(h, dq))
        ga = (jp - j0) / h
        rows.append((ga, abs(ga - gradj), h))
    return rows


def test_gradient_centered_finite_differences_NS(
        ns: NavierStokesSolver, ode: ODESolver, q: ctrl_mod.Control,
        dq: ctrl_mod.Control, gradj: float, ks=range(1, 9)):
    """Centered FD table (``helper_functions.py:109-179``)."""
    rows = []
    for k in ks:
        h = 10.0 ** (-k)
        jp = _forward_J(ns, ode, q.axpy(h, dq))
        jm = _forward_J(ns, ode, q.axpy(-h, dq))
        gc = (jp - jm) / (2 * h)
        rows.append((gc, abs(gc - gradj), h))
    return rows


def test_gradient_on_rhs_control(space, bq, bc, ode: ODESolver,
                                 q_p2: jnp.ndarray, dq_p2: jnp.ndarray,
                                 gradj: float, viscosity: float = 1.0,
                                 alpha: float = 1e-2, ks=range(1, 9)):
    """RHS-control variant (``helper_functions.py:286-347``): the control
    is a VOLUME force f ∈ P2, J's Tikhonov term is ∫_Ω |f|² dx."""
    import jax
    from ..fem import assemble
    from ..solve import newton_solve

    bc_dofs, bc_vals = bc

    def volume_load(f_p2):
        fl = f_p2[space.cell_dofs_p2]
        def per_cell(fl_, dj):
            f_q = jnp.einsum("qa,ai->qi", space.phi2, fl_)
            rv = jnp.einsum("q,qi,qa->ai", space.qw * dj, f_q, space.phi2)
            return jnp.concatenate([rv.reshape(12), jnp.zeros(3, rv.dtype)])
        vals = jax.vmap(per_cell)(fl, space.cell_detj)
        return assemble.scatter_vector(space.ndof, space.cell_dofs_mixed,
                                       vals)

    def solve_state(f_p2):
        load = volume_load(f_p2)
        res = newton_solve(
            lambda w: assemble.ns_residual(space, None, w, None,
                                           viscosity) - load,
            lambda w: assemble.ns_operator(space, None, w, viscosity,
                                           bc_dofs),
            jnp.zeros(space.ndof), bc_dofs, bc_vals)
        return res.w

    def j_of(f_p2):
        w = solve_state(f_p2)
        u, _ = space.split(w)
        x = ode.ode_solving_step(u)
        uv = evaluate_fct(space, u, x)
        part_a = 0.5 * float(np.sum(ode.h * np.sum(
            (uv - ode.u_d) ** 2, axis=-1)))
        fl = f_p2[space.cell_dofs_p2]
        def norm_cell(fl_, dj):
            f_q = jnp.einsum("qa,ai->qi", space.phi2, fl_)
            return jnp.sum(space.qw * dj * jnp.sum(f_q ** 2, axis=-1))
        tikh = float(jnp.sum(jax.vmap(norm_cell)(fl, space.cell_detj)))
        return part_a + 0.5 * alpha * tikh

    j0 = j_of(q_p2)
    rows = []
    for k in ks:
        h = 10.0 ** (-k)
        ga = (j_of(q_p2 + h * dq_p2) - j0) / h
        rows.append((ga, abs(ga - gradj), h))
    return rows


def eval_vector_field(space, u, nx: int = 25,
                      extent=(0.0, 0.0, 2.0, 2.0)) -> dict:
    """Sample a velocity field on a regular grid for quiver plots
    (``helper_functions.py:350-402``)."""
    xs = np.linspace(extent[0], extent[2], nx)
    ys = np.linspace(extent[1], extent[3], nx)
    xg, yg = np.meshgrid(xs, ys)
    pts = jnp.asarray(np.stack([xg.ravel(), yg.ravel()], axis=1))
    vals, inside = eval_velocity(space, jnp.asarray(u), pts)
    vals = np.where(np.asarray(inside)[:, None], np.asarray(vals), 0.0)
    return {"x": xg, "y": yg,
            "u": vals[:, 0].reshape(nx, nx),
            "v": vals[:, 1].reshape(nx, nx)}
