"""Matrix-free CG gradient projector == dense-LU projector.

The CG regime exists so Nx>=192 can build at all (the dense P1 mass at
Nx=256 is a 17.5 GB f32 square — the round-3 hires OOM); below the cap
the dense path stays the default, so this parity pins that the switch is
invisible wherever both can run."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod
from ocean_jax.solve.projection import GradProjector


def _problem(nx=12):
    rng = np.random.default_rng(0)
    cfg = OCPConfig(unit_square_resolution=nx, ud_experiment="3_buoys",
                    T=0.05, dt=0.005)
    seeds = 0.3 + 1.0 * rng.random((3, 2))
    u_d = 0.05 * rng.standard_normal((3, cfg.num_time_steps, 2))
    return sys_mod.build_problem(cfg, u_d=u_d, x0=seeds)


def test_cg_projector_matches_dense():
    prob = _problem()
    space = prob.space
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((space.n_p2, 2)))

    dense = GradProjector.build(space, solver="dense")
    cg = GradProjector.build(space, solver="cg")
    assert dense.mode != "cg" and cg.mode == "cg"
    gd = dense.project(space, u)
    gc = cg.project(space, u)
    assert float(jnp.abs(gd - gc).max()) < 1e-12 * float(
        jnp.abs(gd).max() + 1.0)


def test_cg_mass_solve_converges_at_nx64():
    """Direct check of the CG regime's mesh-independence claim: at Nx=64
    (4225 P1 dofs — 5x the parity test's mesh), the fixed 60-iteration
    lumped-Jacobi CG still hits f64 roundoff vs a dense solve."""
    import numpy as np_
    from ocean_jax.mesh import rectangle_mesh
    from ocean_jax.fem import make_space, assemble
    from ocean_jax.solve import projection as pj

    space = make_space(rectangle_mesh((0.0, 0.0), (2.0, 2.0), 64, 64))
    rng = np_.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(space.n_p1))
    minv = pj._lumped_inverse(space)
    x_cg = pj._pcg(space, minv, b, pj.CG_ITERS)
    mass = np_.asarray(assemble.p1_mass_matrix(space))
    x_ref = jnp.asarray(np_.linalg.solve(mass, np_.asarray(b)))
    rel = float(jnp.abs(x_cg - x_ref).max() / jnp.abs(x_ref).max())
    assert rel < 1e-12


def test_auto_uses_dense_below_cap():
    prob = _problem(nx=8)
    pj = GradProjector.build(prob.space, solver="auto")
    assert pj.mode != "cg" and pj.mass is not None


@pytest.mark.slow
def test_cg_projector_in_gd_step():
    """Full GD step with the CG projector == dense projector step."""
    import dataclasses
    prob = _problem()
    f = sys_mod.initial_control(prob, case=1)
    prob_cg = dataclasses.replace(
        prob, projector=GradProjector.build(prob.space, solver="cg"))
    lr = jnp.asarray(1.0)
    a = sys_mod.gd_step(prob, f, lr, use_line_search=True)
    b = sys_mod.gd_step(prob_cg, f, lr, use_line_search=True)
    assert abs(float(a.J) - float(b.J)) < 1e-11 * (abs(float(a.J)) + 1.0)
    assert float(jnp.abs(a.f_new.quad - b.f_new.quad).max()) < 1e-10
