"""Transposed-LU adjoint solve (one factorization per GD iteration).

For ν=1 the reference's adjoint operator (``OCP_dolfin.py:344-347``, the
deliberately coefficient-free Laplacian) is exactly the transposed Newton
Jacobian, so the primal solve's float32 LU factors precondition the
adjoint solve (``solve/linear.py::solve_operator_reuse_t``). These tests
pin: bitwise-level parity of the adjoint state and gradient against the
fresh-factorization path, convergence of the Richardson loop under both
fresh and Stokes-frozen (``newton_reuse_lu``) factors, and the auto gate.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod
from ocean_jax.fem import assemble
from ocean_jax.solve.linear import solve_operator, solve_operator_reuse_t


@pytest.fixture(scope="module")
def prob_pair():
    cfg = OCPConfig(unit_square_resolution=16, ud_experiment="2_buoys",
                    viscosity=1.0)
    prob_off = dataclasses.replace(sys_mod.build_problem(cfg),
                                   adjoint_reuse_lu=False)
    prob_on = dataclasses.replace(prob_off, adjoint_reuse_lu=True)
    f = sys_mod.initial_control(prob_off, case=0)
    return prob_off, prob_on, f


def test_auto_gate():
    assert sys_mod.resolve_adjoint_reuse("auto", 1.0, "dense")
    assert not sys_mod.resolve_adjoint_reuse("auto", 0.01, "dense")
    assert not sys_mod.resolve_adjoint_reuse("auto", 1.0, "mg")
    assert sys_mod.resolve_adjoint_reuse("on", 0.01, "mg")
    assert not sys_mod.resolve_adjoint_reuse("off", 1.0, "dense")
    with pytest.raises(ValueError):
        sys_mod.resolve_adjoint_reuse("maybe", 1.0, "dense")


@pytest.mark.slow
def test_adjoint_state_parity(prob_pair):
    prob_off, prob_on, f = prob_pair
    fwd = sys_mod.forward(prob_off, f.quad)
    assert fwd.newton.fac is not None
    z_ref = sys_mod.solve_adjoint(prob_off, fwd)
    z_new = sys_mod.solve_adjoint(prob_on, fwd)
    scale = float(jnp.linalg.norm(z_ref))
    assert float(jnp.linalg.norm(z_new - z_ref)) <= 1e-10 * scale


@pytest.mark.slow
def test_richardson_converges_without_fallback(prob_pair):
    prob_off, _, f = prob_pair
    fwd = sys_mod.forward(prob_off, f.quad)
    b = sys_mod.adjoint_rhs(prob_off, fwd)
    op, _ = sys_mod.adjoint_operators(prob_off, fwd.w)
    x, converged = solve_operator_reuse_t(op, b, prob_off.bc_vals,
                                          fwd.newton.fac)
    assert bool(converged), "transposed-factor Richardson hit the fallback"
    x_ref = solve_operator(op, b, prob_off.bc_vals)
    assert float(jnp.linalg.norm(x - x_ref)) <= 1e-10 * float(
        jnp.linalg.norm(x_ref))


@pytest.mark.slow
def test_precomputed_stokes_fac0_bit_identical(prob_pair):
    """build_problem precomputes the control-independent Stokes LU
    (``OCPProblem.fac0``); the GD step with it equals the in-program
    factorization bitwise (same matrix, same factorization, merely
    hoisted out of the iteration)."""
    prob_off, _, f = prob_pair
    assert prob_off.fac0 is not None
    lr = jnp.asarray(5.0)
    a = sys_mod.gd_step(prob_off, f, lr, use_line_search=True,
                        max_ls_iters=8)
    b = sys_mod.gd_step(dataclasses.replace(prob_off, fac0=None), f, lr,
                        use_line_search=True, max_ls_iters=8)
    assert float(a.J) == float(b.J)
    assert float(jnp.max(jnp.abs(a.f_new.quad - b.f_new.quad))) == 0.0
    assert float(a.lr) == float(b.lr)


@pytest.mark.slow
def test_parity_under_stale_stokes_factors(prob_pair):
    """newton_reuse_lu=True leaves J(w0)=Stokes factors in the result;
    the transposed-factor adjoint must still converge and agree."""
    prob_off, prob_on, f = prob_pair
    prob_fast = dataclasses.replace(prob_on, newton_reuse_lu=True)
    fwd = sys_mod.forward(prob_fast, f.quad)
    assert bool(jnp.isfinite(fwd.newton.residual_norm))
    z_ref = sys_mod.solve_adjoint(prob_off,
                                  sys_mod.forward(prob_off, f.quad))
    z_new = sys_mod.solve_adjoint(prob_fast, fwd)
    scale = float(jnp.linalg.norm(z_ref))
    assert float(jnp.linalg.norm(z_new - z_ref)) <= 1e-9 * scale


@pytest.mark.slow
def test_gd_step_parity(prob_pair):
    prob_off, prob_on, f = prob_pair
    lr = jnp.asarray(5.0)
    r_off = sys_mod.gd_step(prob_off, f, lr)
    r_on = sys_mod.gd_step(prob_on, f, lr)
    assert not bool(r_on.diverged)
    np.testing.assert_allclose(float(r_on.J), float(r_off.J),
                               rtol=1e-11, atol=0)
    scale = float(jnp.linalg.norm(r_off.f_new.quad))
    assert float(jnp.linalg.norm(r_on.f_new.quad - r_off.f_new.quad)) \
        <= 1e-9 * scale
    assert float(r_on.lr) == float(r_off.lr)
