"""Viscosity-continuation Newton (newton_continuation knob).

The reference's vanilla Newton — ``solve(F == 0, w, bcs)`` from a fresh
zero Function every GD iteration (``OCP_dolfin.py:315,325``) — diverges at
the 10_buoys golden-run viscosity ν=0.01 (its only sub-ν=1 configuration,
``reference_runs/10_buoys/variables.txt``). The ν-ladder warm start
reaches the strong solution on both linear-solver paths; default 0 keeps
the reference-exact single solve.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod


def _cfg(**kw):
    return OCPConfig(unit_square_resolution=16, ud_experiment="10_buoys",
                     viscosity=0.01, use_line_search=True, **kw)


def test_vanilla_newton_diverges_at_golden_viscosity():
    """Documents the failure mode the knob exists for: from w=0 at
    ν=0.01 the Newton residual grows ~1 → 4e4 (same on the reference's
    algorithm — this is a basin property, not a solver bug)."""
    prob = sys_mod.build_problem(_cfg())
    f = sys_mod.initial_control(prob, case=0)
    r = sys_mod.solve_ns(prob, f.quad)
    assert not bool(r.converged)
    assert float(r.residual_norm) > 1.0


@pytest.mark.slow
def test_continuation_reaches_golden_viscosity_dense():
    cfg = _cfg(newton_continuation=6)
    pd = sys_mod.build_problem(cfg)
    f = sys_mod.initial_control(pd, case=0)
    rd = sys_mod.solve_ns(pd, f.quad)
    assert bool(rd.converged)
    # a genuinely strong flow — the state vanilla Newton cannot reach
    assert float(jnp.max(jnp.abs(rd.w))) > 3.0


@pytest.mark.slow
def test_continuation_mg_coarse_mesh_stall_is_detected():
    """On the mg path at Nx=16 the ladder's last rungs are
    convection-dominated (cell Péclet u·h/ν ≈ 20): damped-Jacobi
    smoothing loses the velocity block and Newton stalls — and the
    solver REPORTS it (converged=False feeding gd_step.diverged) rather
    than returning silently wrong states. Finer meshes shrink Pe ∝ h
    (the Nx=64 hardware probe's regime is Pe ≈ 3); the dense anchor
    (above) is exact at any ν."""
    cfg = _cfg(newton_continuation=6)
    pm = sys_mod.build_problem(
        dataclasses.replace(cfg, linear_solver="mg"))
    f = sys_mod.initial_control(pm, case=0)
    rm = sys_mod.solve_ns(pm, f.quad)
    assert not bool(rm.converged)
    assert np.isfinite(float(rm.residual_norm))


@pytest.mark.slow
def test_continuation_gd_step_descends():
    cfg = _cfg(newton_continuation=6)
    prob = sys_mod.build_problem(cfg)
    f = sys_mod.initial_control(prob, case=0)
    res = sys_mod.gd_step(prob, f, jnp.asarray(5.0), use_line_search=True,
                          max_ls_iters=10)
    assert not bool(res.diverged)
    assert np.isfinite(float(res.J))
