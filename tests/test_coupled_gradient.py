"""Coupled NS+ODE gradient verification (the reference's grad_check, C1/C5).

Three layers of evidence:
  1. the reference-style adjoint gradient agrees with centered FD of the
     full forward pipeline down to the adjoint's consistency floor,
  2. jax.grad of the full discrete pipeline (via the implicit-diff NS
     solver) agrees with centered FD to near machine precision,
  3. the two gradients agree with each other at the consistency level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod
from ocean_jax import control as ctrl_mod
from ocean_jax.ode import solve_primal_ode


@pytest.fixture(scope="module")
def small_problem():
    cfg = OCPConfig(unit_square_resolution=10, ud_experiment="2_buoys",
                    viscosity=1.0)
    prob = sys_mod.build_problem(cfg)
    return cfg, prob


def _fd_table(prob, f, df, hs):
    out = {}
    for h in hs:
        fp = f.quad + h * df.quad
        fm = f.quad - h * df.quad
        jp = float(sys_mod.cost(prob, sys_mod.forward(prob, fp).u_values, fp))
        jm = float(sys_mod.cost(prob, sys_mod.forward(prob, fm).u_values, fm))
        out[h] = (jp - jm) / (2 * h)
    return out


@pytest.mark.slow
def test_adjoint_gradient_vs_fd(small_problem):
    cfg, prob = small_problem
    f = sys_mod.initial_control(prob, case=0)
    df = sys_mod.fd_direction(prob)
    fwd = sys_mod.forward(prob, f.quad)
    assert bool(fwd.newton.converged)
    assert not bool(fwd.mask.any())
    z = sys_mod.solve_adjoint(prob, fwd)
    g = sys_mod.reduced_gradient(prob, f, z)
    gradj = float(ctrl_mod.boundary_inner(prob.bq, g, df))

    fd = _fd_table(prob, f, df, [1e-3, 1e-4, 1e-5])
    rel = min(abs(fd[h] - gradj) / abs(gradj) for h in fd)
    # reference-style adjoint: consistent but not exactly the discrete
    # gradient (P1-projected ∇u in the adjoint ODE, continuous adjoint
    # form). The reference's own tables plateau at a comparable level.
    assert abs(gradj) > 1e-8
    assert rel < 5e-3, (gradj, fd)


@pytest.mark.slow
def test_jax_grad_exact_vs_fd(small_problem):
    """jax.grad through NS (implicit diff) + ODE scan + cost is the exact
    discrete gradient: matches centered FD to ~1e-9 relative."""
    cfg, prob = small_problem
    f = sys_mod.initial_control(prob, case=0)
    df = sys_mod.fd_direction(prob)
    ns = sys_mod.make_differentiable_ns_solver(prob)

    def j_of_f(fq):
        w = ns(fq)
        u, _ = prob.space.split(w)
        ode = solve_primal_ode(prob.space, u, prob.x0, prob.h, prob.nt,
                               prob.center)
        return sys_mod.cost(prob, ode.u_values, fq)

    g_auto = jax.grad(j_of_f)(f.quad)
    directional = float(jnp.sum(g_auto * df.quad))
    fd = _fd_table(prob, f, df, [1e-5])
    assert np.isclose(directional, fd[1e-5], rtol=1e-7), (directional, fd)

    # and the adjoint gradient agrees with the exact one at consistency level
    fwd = sys_mod.forward(prob, f.quad)
    z = sys_mod.solve_adjoint(prob, fwd)
    g = sys_mod.reduced_gradient(prob, f, z)
    gradj = float(ctrl_mod.boundary_inner(prob.bq, g, df))
    assert np.isclose(directional, gradj, rtol=5e-3)


@pytest.mark.slow
def test_jax_grad_correct_in_escape_regime():
    """Where the reference's adjoint is inconsistent (escaped buoys are
    dropped from the adjoint but their pre-escape velocities remain in J —
    OCP_dolfin.py:237,354 vs :258), jax.grad of the actual computational
    graph still matches FD: the framework computes the correct gradient
    in regimes where the reference's method cannot."""
    from ocean_jax.ode import solve_primal_ode
    cfg = OCPConfig(ud_experiment="10_buoys", unit_square_resolution=12)
    prob = sys_mod.build_problem(cfg)
    f = sys_mod.initial_control(prob, case=0)
    fwd = sys_mod.forward(prob, f.quad)
    assert int(fwd.mask.sum()) > 0          # escape regime
    ns = sys_mod.make_differentiable_ns_solver(prob)

    def j_of(fq):
        w = ns(fq)
        u, _ = prob.space.split(w)
        ode = solve_primal_ode(prob.space, u, prob.x0, prob.h, prob.nt,
                               prob.center)
        return sys_mod.cost(prob, ode.u_values, fq)

    df = sys_mod.fd_direction(prob)
    directional = float(jnp.sum(jax.grad(j_of)(f.quad) * df.quad))
    h = 1e-4
    fd = (float(j_of(f.quad + h * df.quad))
          - float(j_of(f.quad - h * df.quad))) / (2 * h)
    assert abs(fd - directional) / abs(fd) < 1e-6
    # ...while the reference-style adjoint disagrees materially here
    z = sys_mod.solve_adjoint(prob, fwd)
    g = sys_mod.reduced_gradient(prob, f, z)
    gradj_ref = float(ctrl_mod.boundary_inner(prob.bq, g, df))
    assert abs(gradj_ref - fd) / abs(fd) > 0.1
