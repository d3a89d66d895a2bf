"""Scatter-free ELL matvec (ops/ell.py) equals the element scatter matvec
exactly — the gather-only Krylov fast path for TPU mg solves."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod
from ocean_jax.fem import assemble
from ocean_jax.ops.ell import build_ell_tables, ell_matvec_fn
from ocean_jax.solve import mg as mg_mod


def _mg_problem(nx=12, K=3):
    rng = np.random.default_rng(3)
    cfg = OCPConfig(unit_square_resolution=nx, ud_experiment=f"{K}_buoys",
                    T=0.05, dt=0.005, linear_solver="mg")
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    x0 = 0.3 + 1.4 * rng.random((K, 2))
    return sys_mod.build_problem(cfg, u_d=u_d, x0=x0)


def _tables(prob):
    cd = np.asarray(prob.space.cell_dofs_mixed)
    fd = cd[np.asarray(prob.bq.cells)]
    bc = np.asarray(prob.bc_dofs)
    return (build_ell_tables(cd, fd, prob.space.ndof, bc),
            build_ell_tables(cd[:, :12], fd[:, :12], 2 * prob.space.n_p2,
                             bc))


@pytest.mark.slow
def test_ell_matvec_matches_scatter_mixed_and_velocity():
    prob = _mg_problem()
    ell_mixed, ell_vel = _tables(prob)
    rng = np.random.default_rng(0)
    w = jnp.asarray(0.1 * rng.standard_normal(prob.space.ndof))
    op = assemble.ns_operator(prob.space, prob.bq, w, prob.nu,
                              prob.bc_dofs)
    x = jnp.asarray(rng.standard_normal(prob.space.ndof))

    y_ref = op.matvec64(x)
    y_ell = ell_matvec_fn(ell_mixed, op, jnp.float64)(x)
    assert float(jnp.max(jnp.abs(y_ref - y_ell))) < 1e-12

    n_vel = 2 * prob.space.n_p2
    vel = mg_mod.velocity_block(op, n_vel)
    xv = jnp.asarray(rng.standard_normal(n_vel))
    yv_ref = vel.matvec64(xv)
    yv_ell = ell_matvec_fn(ell_vel, vel, jnp.float64)(xv)
    assert float(jnp.max(jnp.abs(yv_ref - yv_ell))) < 1e-12

    # adjoint operator shares the topology — same tables apply
    opa = assemble.adjoint_operator(prob.space, prob.bq, w, prob.bc_dofs)
    ya_ref = opa.matvec64(x)
    ya_ell = ell_matvec_fn(ell_mixed, opa, jnp.float64)(x)
    assert float(jnp.max(jnp.abs(ya_ref - ya_ell))) < 1e-12


def test_ell_f32_close():
    """The f32 ELL matvec tracks the f64 scatter matvec at f32 accuracy
    (it feeds the native-f32 FGMRES production path)."""
    prob = _mg_problem()
    ell_mixed, _ = _tables(prob)
    rng = np.random.default_rng(1)
    w = jnp.asarray(0.1 * rng.standard_normal(prob.space.ndof))
    op = assemble.ns_operator(prob.space, prob.bq, w, prob.nu,
                              prob.bc_dofs)
    x = jnp.asarray(rng.standard_normal(prob.space.ndof))
    y64 = op.matvec64(x)
    y32 = ell_matvec_fn(ell_mixed, op, jnp.float32)(x)
    denom = float(jnp.max(jnp.abs(y64))) + 1e-30
    assert float(jnp.max(jnp.abs(y64 - y32.astype(jnp.float64)))) < \
        1e-4 * denom


def test_ell_no_facets():
    """Tables built without facet terms (bq=None operators)."""
    prob = _mg_problem()
    rng = np.random.default_rng(2)
    cd = np.asarray(prob.space.cell_dofs_mixed)
    tables = build_ell_tables(cd, None, prob.space.ndof,
                              np.asarray(prob.bc_dofs))
    w = jnp.asarray(0.1 * rng.standard_normal(prob.space.ndof))
    op = assemble.ns_operator(prob.space, None, w, prob.nu, prob.bc_dofs)
    assert op.facet_mats is None
    x = jnp.asarray(rng.standard_normal(prob.space.ndof))
    y_ref = op.matvec64(x)
    y_ell = ell_matvec_fn(tables, op, jnp.float64)(x)
    assert float(jnp.max(jnp.abs(y_ref - y_ell))) < 1e-12
