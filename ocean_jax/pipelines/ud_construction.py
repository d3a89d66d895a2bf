"""Ground-truth measurement-data generator (u_d construction).

Reimplements ``plotting/ud_construction_pipeline.py`` (reference C12):
solve stationary NS on the [0,2]² square (Nx=32) driven by Dirichlet
conditions — Taylor–Green inflow on x=0/x=2, no-slip on y=0/y=2, pressure
pinned to 0 on the left edge (``ud_construction_pipeline.py:95-106``) —
then advect K buoy seeds through the flow and record their velocity time
series as the synthetic measurements ``u_d_array.npy`` / ``x_0_array.npy``
(``:264-268``), plus L2/H1 norms, divergence, and plots.

NOTE (reference quirk, reproduced): the NS form nominally contains
``-0.5 (u·n)(u·v) ds(1) - F_rhs·v ds(1)`` but the boundary function is never
marked (``:71-76``), so ds(1) is empty — the flow is purely Dirichlet-driven.

Seed layouts (reconstructed from ``reference_runs/*/x_0_array.npy``):
  * 6 buoys: the hard-coded seeds (``:129-130``),
  * 2/4 buoys: prefixes of the 6-buoy seeds,
  * 10: x=0.1, y=linspace(0.25,1.75,10),
  * 100: meshgrid(linspace(0.1,0.25,10), linspace(0.25,1.75,10)),
  * 400: meshgrid(linspace(0.1,0.4,20), linspace(0.25,1.75,20)),
  * 10000: meshgrid(linspace(0.1,0.4,100), linspace(0.25,1.75,100))
    (the reference shipped no arrays for this case — SURVEY §6 note).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import (make_space, dirichlet_velocity_bc, dirichlet_pressure_bc,
                   combine_bcs, assemble)
from ..mesh import rectangle_mesh
from ..ode import solve_primal_ode
from ..solve import newton_solve

_EPS = 1e-12


def seed_positions(K: int) -> np.ndarray:
    base6 = np.array([[0.25, 1.25], [1.75, 0.5], [0.5, 1.6],
                      [1.5, 0.3], [0.75, 1.0], [1.0, 1.5]])
    if K in (2, 4, 6):
        return base6[:K]
    if K == 10:
        return np.stack([np.full(10, 0.1),
                         np.linspace(0.25, 1.75, 10)], axis=1)
    grids = {100: 10, 400: 20, 10000: 100}
    if K in grids:
        n = grids[K]
        xg, yg = np.meshgrid(np.linspace(0.1, 0.25 if K == 100 else 0.4, n),
                             np.linspace(0.25, 1.75, n))
        return np.stack([xg.ravel(), yg.ravel()], axis=1)
    raise ValueError(f"no seed layout for K={K}")


def taylor_green(x: np.ndarray) -> np.ndarray:
    """inflow = (-cos(πx)sin(πy), sin(πx)cos(πy))
    (``ud_construction_pipeline.py:95``)."""
    return np.stack([-np.cos(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]),
                     np.sin(np.pi * x[:, 0]) * np.cos(np.pi * x[:, 1])],
                    axis=1)


def constant_inflow(x: np.ndarray) -> np.ndarray:
    """inflow = (0.1, 0.0) — the configuration that generated the
    10/100/400/10000-buoy golden datasets (verified by reconstructing the
    shipped ``velocity.h5`` fields: the commented variant at
    ``ud_construction_pipeline.py:96``)."""
    return np.stack([np.full(len(x), 0.1), np.zeros(len(x))], axis=1)


def inflow_for(K: int):
    """The inflow profile each golden dataset was generated with."""
    return taylor_green if K in (2, 4, 6) else constant_inflow


def build(nx: int = 32, viscosity: float = 1.0, diagonal: str = "right",
          inflow=taylor_green):
    mesh = rectangle_mesh((0.0, 0.0), (2.0, 2.0), nx, nx, diagonal=diagonal)
    space = make_space(mesh)
    # BCs in dolfin list order (later applications overwrite earlier):
    # no-slip y∈{0,2}; inflow x∈{0,2}; pressure pin x=0
    bc_noslip = dirichlet_velocity_bc(
        mesh, space,
        lambda x: (np.abs(x[:, 1]) < _EPS) | (np.abs(x[:, 1] - 2.0) < _EPS))
    bc_inflow = dirichlet_velocity_bc(
        mesh, space,
        lambda x: (np.abs(x[:, 0]) < _EPS) | (np.abs(x[:, 0] - 2.0) < _EPS),
        value=inflow)
    bc_p = dirichlet_pressure_bc(mesh, space,
                                 lambda x: x[:, 0] < _EPS, 0.0)
    bc_dofs, bc_vals = combine_bcs(bc_noslip, bc_inflow, bc_p)
    return mesh, space, (bc_dofs, bc_vals), viscosity


def solve_flow(space, bcs, viscosity: float):
    """Newton solve of the Dirichlet-driven NS flow (jit-compiled)."""
    bc_dofs, bc_vals = bcs

    @jax.jit
    def _solve():
        def residual(w):
            return assemble.ns_residual(space, None, w, None, viscosity)

        def operator(w):
            return assemble.ns_operator(space, None, w, viscosity, bc_dofs)

        w0 = jnp.zeros(space.ndof)
        return newton_solve(residual, operator, w0, bc_dofs, bc_vals)

    return _solve()


def run(nx: int = 32, K: int = 6, viscosity: float = 1.0,
        T: float = 1.0, dt: float = 0.005,
        out_dir: Optional[str] = None, diagonal: str = "right",
        inflow=None):
    """Full pipeline; returns (x, u_values, w, norms) and optionally writes
    the artifact set."""
    if inflow is None:
        inflow = inflow_for(K)
    mesh, space, bcs, nu = build(nx, viscosity, diagonal, inflow)
    res = solve_flow(space, bcs, nu)
    u, p = space.split(res.w)
    nt = int(T / dt)
    seeds = jnp.asarray(seed_positions(K))
    center = jnp.asarray([1.0, 1.0])
    ode = solve_primal_ode(space, u, seeds, dt, nt, center)
    l2, h1 = assemble.velocity_norms(space, u)
    div = assemble.divergence_l2(space, u)
    result = {
        "w": res.w, "x": np.asarray(ode.x),
        "u_values": np.asarray(ode.u_values),
        "mask": np.asarray(ode.mask),
        "L2": float(l2), "H1": float(h1), "div": float(div),
        "newton_iters": int(res.iterations),
        "converged": bool(res.converged),
    }
    if out_dir is not None:
        import os
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, "u_d_array.npy"), result["u_values"])
        np.save(os.path.join(out_dir, "x_0_array.npy"), result["x"])
        with open(os.path.join(out_dir, "norms.txt"), "w") as fh:
            fh.write("L2: %s \n" % result["L2"])
            fh.write("H1: %s \n" % result["H1"])
        with open(os.path.join(out_dir, "u_divergence.txt"), "w") as fh:
            fh.write("div(u) \t \t \t i  \n")
            fh.write(f" {result['div']} \t 0 \n")
    return result
