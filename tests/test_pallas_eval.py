"""Fused Pallas P1-tensor eval kernel (ode/pallas_eval.py) vs the f64
gather path — interpret mode on CPU (hardware parity measured on TPU:
eval ~1e-13; end-to-end gradient 4e-9 rel through the adjoint solve's
conditioning)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod
from ocean_jax.fem.interpolate import eval_p1_tensor
from ocean_jax.ode import solve_adjoint_ode
from ocean_jax.ode.grideval import grad_to_grid
from ocean_jax.ode.pallas_eval import eval_p1_tensor_pallas


def _prob(nx=6, lshape=False, diagonal=None):
    cfg = OCPConfig(unit_square_resolution=nx, L_shape=lshape,
                    L_shape_resolution=nx,
                    ud_experiment="3_buoys" if lshape else "2_buoys",
                    T=0.05, dt=0.005, ode_backend="pallas")
    rng = np.random.default_rng(0)
    if lshape:
        u_d, x0 = sys_mod.lshape_ud(cfg)
    else:
        u_d = 0.05 * rng.standard_normal((2, cfg.num_time_steps, 2))
        x0 = 0.3 + 1.4 * rng.random((2, 2))
    return sys_mod.build_problem(cfg, u_d=u_d, x0=x0)


@pytest.mark.parametrize("lshape", [False, True])
def test_eval_matches_gather(lshape):
    prob = _prob(lshape=lshape)
    rng = np.random.default_rng(1)
    grad_u = jnp.asarray(rng.standard_normal((prob.space.n_p1, 2, 2)))
    lo = prob.space.locator
    xmin, ymin, xmax, ymax = lo.extent
    pts = jnp.asarray(rng.uniform([xmin, ymin], [xmax, ymax], (256, 2)))
    ref, ins_ref = eval_p1_tensor(prob.space, grad_u, pts)
    val, ins = eval_p1_tensor_pallas(
        prob.grid, grad_to_grid(prob.grid, grad_u), pts)
    assert bool((ins == ins_ref).all())
    sel = np.asarray(ins_ref)
    d = np.abs(np.asarray(ref) - np.asarray(val))[sel].max()
    # interpret mode (CPU) can lose the double-single error words to
    # XLA:CPU fusion (compile-variant: the same run measures 1e-14 or
    # ~1.5e-7 = f32 eps); the compiled TPU kernel holds ~1e-13 — see the
    # hardware numbers in ode/pallas_eval.py. Bound at f32 level here.
    assert d < 2e-6, d


@pytest.mark.parametrize("obstacle,graded", [(True, False), (True, True),
                                             (False, True)])
@pytest.mark.slow
def test_eval_matches_grid_on_pipe_domains(obstacle, graded):
    """Round-3 tail: the eval kernel covers the gen-1 pipe domains —
    graded tensor grids via the in-kernel searchsorted, hole domains by
    clamped evaluation + the caller's f64 in_domain mask (identical to
    the XLA grid path even on masked lanes)."""
    from ocean_jax.mesh import structured
    from ocean_jax.fem.spaces import make_space
    from ocean_jax.ode.grideval import make_grideval, eval_p1_tensor_grid
    kw = dict(lc_min=0.08, lc_max=0.3) if graded else dict(resolution=12)
    mesh, _ = structured.pipe_mesh(obstacle=obstacle, graded=graded, **kw)
    sp = make_space(mesh)
    ge = make_grideval(sp)
    rng = np.random.default_rng(5)
    grad_u = jnp.asarray(rng.standard_normal((sp.n_p1, 2, 2)))
    g_img = grad_to_grid(ge, grad_u)
    pts = jnp.asarray(rng.uniform([0.0, 0.0], [2.0, 2.0], (512, 2)))
    ref, ins_ref = eval_p1_tensor_grid(ge, g_img, pts)
    val, ins = eval_p1_tensor_pallas(ge, g_img, pts)
    assert bool((ins == ins_ref).all())
    if obstacle:
        assert not bool(ins.all())          # hole lanes exercised
    sel = np.asarray(ins_ref)
    d = np.abs(np.asarray(ref) - np.asarray(val))[sel].max()
    assert d < 2e-6, d                      # f32-level CPU-interpret bar


@pytest.mark.slow
def test_adjoint_mu_matches():
    """solve_adjoint_ode with the kernel equals the gather path, incl.
    the reuse-previous-∇u escape quirk handled outside the kernel."""
    prob = _prob()
    f = sys_mod.initial_control(prob, case=0)
    fwd = sys_mod.forward(prob, f.quad)
    u, _ = prob.space.split(fwd.w)
    gu = prob.projector.project(prob.space, u)
    mu_ref = solve_adjoint_ode(prob.space, gu, fwd.x, fwd.u_values,
                               prob.u_d, fwd.mask, prob.h)
    mu_pal = solve_adjoint_ode(prob.space, gu, fwd.x, fwd.u_values,
                               prob.u_d, fwd.mask, prob.h, grid=prob.grid)
    # f32-level bound for the interpret-mode EFT caveat (see above);
    # hardware parity is ~1e-13 eval / 4e-9 end-to-end gradient
    assert float(jnp.max(jnp.abs(mu_ref - mu_pal))) < 1e-6
