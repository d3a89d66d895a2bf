"""Opt-in consistent-adjoint mode for escape regimes (BACKLOG item 0).

The reference drops escaped buoys from the adjoint ODE and point sources
(OCP_dolfin.py:237-238,354-355) while their pre-escape velocities still
enter J (:258-261) — its gradient under-counts whenever buoys escape
(demonstrated 2x off in results/gradcheck_10_buoys/). adjoint_mode=
"consistent" keeps the pre-escape contributions; these tests pin:

  * FD match in an escape regime (measured 3e-5 rel where the reference
    path is ~12% off),
  * bit-identity with the reference path when no buoy escapes.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import control as ctrl_mod
from ocean_jax import system as sys_mod


@pytest.fixture(scope="module")
def escape_setup():
    rng = np.random.default_rng(3)
    K = 8
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment=f"{K}_buoys",
                    T=0.25, dt=0.005)
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    # seeds biased toward the right boundary; the strong outflow control
    # ejects one of them (mask = [F,T,F,...], kfail = 45)
    x0 = np.column_stack([1.2 + 0.7 * rng.random(K),
                          0.3 + 1.4 * rng.random(K)])
    prob = sys_mod.build_problem(cfg, u_d=u_d, x0=x0)
    f = ctrl_mod.constant(prob.space, prob.bq, [3.0, 0.0])
    return prob, f


def _gradj(prob, f, df):
    fwd = sys_mod.forward(prob, f.quad)
    z = sys_mod.solve_adjoint(prob, fwd)
    g = sys_mod.reduced_gradient(prob, f, z)
    return float(ctrl_mod.boundary_inner(prob.bq, g, df)), fwd


@pytest.mark.slow
def test_consistent_adjoint_matches_fd_in_escape_regime(escape_setup):
    prob, f = escape_setup
    df = sys_mod.fd_direction(prob)

    gj_ref, fwd = _gradj(prob, f, df)
    assert bool(fwd.mask.any()), "setup must eject at least one buoy"

    prob_c = dataclasses.replace(prob, adjoint_mode="consistent")
    gj_con, _ = _gradj(prob_c, f, df)

    h = 1e-5
    def J(fq):
        fw = sys_mod.forward(prob, fq)
        return (float(sys_mod.cost(prob, fw.u_values, fq)),
                np.asarray(fw.mask), np.asarray(fw.kfail))
    jp, mp, kp = J(f.quad + h * df.quad)
    jm, mm, km = J(f.quad - h * df.quad)
    assert (mp == mm).all() and (kp == km).all(), (
        "escape pattern must be FD-stable for the comparison to be valid")
    fd = (jp - jm) / (2 * h)

    rel_con = abs(gj_con - fd) / abs(fd)
    rel_ref = abs(gj_ref - fd) / abs(fd)
    assert rel_con < 5e-4, (gj_con, fd)          # measured 3.0e-5
    assert rel_ref > 1e-2, (gj_ref, fd)          # measured 12% off
    assert rel_con < rel_ref / 20


@pytest.mark.slow
def test_consistent_equals_reference_without_escapes():
    rng = np.random.default_rng(0)
    K = 4
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment=f"{K}_buoys",
                    T=0.05, dt=0.005)
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    x0 = 0.3 + 1.4 * rng.random((K, 2))
    prob = sys_mod.build_problem(cfg, u_d=u_d, x0=x0)
    f = sys_mod.initial_control(prob, case=0)
    fwd = sys_mod.forward(prob, f.quad)
    assert not bool(fwd.mask.any())
    z_ref = sys_mod.solve_adjoint(prob, fwd)
    z_con = sys_mod.solve_adjoint(
        dataclasses.replace(prob, adjoint_mode="consistent"), fwd)
    assert np.array_equal(np.asarray(z_ref), np.asarray(z_con))


@pytest.mark.slow
def test_consistent_fused_psrc_matches_scatter():
    """The fused Pallas point-source kernel now carries the consistent
    active_t window (round-5): consistent-mode adjoint RHS through
    psrc_method='fused' equals the XLA scatter reduction, escapes
    included. The gamma-from-u_values argument holds because escaped
    buoys' pre-escape u_values slots are the real u(x_raw[t]) and the
    kfail+1 quirk slot is u(center) (ode/primal.py post-loop)."""
    rng = np.random.default_rng(3)
    K = 8
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment=f"{K}_buoys",
                    T=0.25, dt=0.005, ode_backend="pallas")
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    x0 = np.column_stack([1.2 + 0.7 * rng.random(K),
                          0.3 + 1.4 * rng.random(K)])
    prob = sys_mod.build_problem(cfg, u_d=u_d, x0=x0)
    f = ctrl_mod.constant(prob.space, prob.bq, [3.0, 0.0])
    prob_scatter = dataclasses.replace(prob, adjoint_mode="consistent",
                                       psrc_method="scatter")
    prob_fused = dataclasses.replace(prob, adjoint_mode="consistent",
                                     psrc_method="fused")
    fwd = sys_mod.forward(prob_scatter, f.quad)
    assert bool(fwd.mask.any())
    b_ref = sys_mod.adjoint_rhs(prob_scatter, fwd)
    b_fused = sys_mod.adjoint_rhs(prob_fused, fwd)
    scale = float(jnp.abs(b_ref).max())
    d = float(jnp.abs(b_fused - b_ref).max()) / max(scale, 1e-30)
    # CPU-interpret EFT bound (see tests/test_psrc_fused.py); ~1e-12 on
    # TPU hardware
    assert d < 5e-6, d
