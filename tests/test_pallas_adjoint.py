"""Fused adjoint-ODE Pallas kernel (ode/pallas_adjoint.py) vs the f64
parallel-scan path — interpret mode on CPU (hardware parity measured on
TPU; see results/bench_stages/). Synthetic trajectories exercise the
out-of-domain reuse-previous-∇u carry, escape masks, and consistent-mode
valid windows without a full forward solve."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod
from ocean_jax.ode import solve_adjoint_ode
from ocean_jax.ode.adjoint import _adjoint_ode_parallel
from ocean_jax.ode.pallas_adjoint import solve_adjoint_ode_pallas

# interpret mode (CPU) can lose double-single error words to XLA:CPU
# fusion (compile-variant, see tests/test_pallas_eval.py); the compiled
# TPU kernel holds ~1e-12. f32-level bound here.
TOL = 2e-6


def _setup(nx=6, lshape=False):
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


def _synthetic(prob, K=5, nt=20, escape_frac=0.3, seed=3):
    """Random trajectories, ~escape_frac of the points wander outside
    (exercising the reuse-previous-∇u carry and the no-valid-yet zero
    prefix), random residuals, a couple of masked buoys."""
    rng = np.random.default_rng(seed)
    lo = prob.space.locator
    xmin, ymin, xmax, ymax = lo.extent
    x = rng.uniform([xmin, ymin], [xmax, ymax], (K, nt, 2))
    out = rng.random((K, nt)) < escape_frac
    x[..., 0] = np.where(out, xmax + 0.5 + rng.random((K, nt)), x[..., 0])
    u_values = 0.1 * rng.standard_normal((K, nt, 2))
    u_d = 0.1 * rng.standard_normal((K, nt, 2))
    mask = np.zeros(K, bool)
    mask[0] = True
    grad_u = rng.standard_normal((prob.space.n_p1, 2, 2))
    return (jnp.asarray(grad_u), jnp.asarray(x), jnp.asarray(u_values),
            jnp.asarray(u_d), jnp.asarray(mask))


@pytest.mark.parametrize("lshape", [False, True])
def test_adjoint_kernel_matches_f64(lshape):
    prob = _setup(lshape=lshape)
    gu, x, uv, ud, mask = _synthetic(prob)
    mu_ref = solve_adjoint_ode(prob.space, gu, x, uv, ud, mask, prob.h)
    mu_pal = solve_adjoint_ode_pallas(prob.grid, gu, x, uv, ud, mask,
                                      prob.h)
    d = float(jnp.max(jnp.abs(mu_ref - mu_pal)))
    assert d < TOL, d
    # masked buoy exactly zero
    assert float(jnp.abs(mu_pal[0]).max()) == 0.0


def test_adjoint_kernel_consistent_window():
    """vlimit gating equals the XLA valid-window form (consistent mode)."""
    prob = _setup()
    gu, x, uv, ud, _ = _synthetic(prob, K=6)
    nt = x.shape[1]
    vlimit = jnp.asarray([3, 7, nt, 0, 12, nt], jnp.int32)
    valid = jnp.arange(nt)[None, :] <= vlimit[:, None]
    zeros = jnp.zeros(6, bool)
    mu_ref = _adjoint_ode_parallel(prob.space, gu, x, uv, ud, zeros,
                                   prob.h, valid=valid)
    mu_pal = solve_adjoint_ode_pallas(prob.grid, gu, x, uv, ud, zeros,
                                      prob.h, vlimit=vlimit)
    d = float(jnp.max(jnp.abs(mu_ref - mu_pal)))
    assert d < TOL, d


@pytest.mark.slow
@pytest.mark.parametrize("obstacle,graded", [(True, False), (True, True),
                                             (False, True)])
def test_adjoint_kernel_pipe_domains(obstacle, graded):
    """Graded tensor grids (in-kernel searchsorted) and hole domains
    (in-kernel circle + active-square predicate) match the XLA grid
    path, including points inside the hole (∇u carry engages)."""
    from ocean_jax.mesh import structured
    from ocean_jax.fem.spaces import make_space
    from ocean_jax.ode.grideval import make_grideval
    kw = dict(lc_min=0.08, lc_max=0.3) if graded else dict(resolution=12)
    mesh, _ = structured.pipe_mesh(obstacle=obstacle, graded=graded, **kw)
    sp = make_space(mesh)
    ge = make_grideval(sp)
    rng = np.random.default_rng(7)
    K, nt = 4, 16
    x = rng.uniform([0.05, 0.05], [1.95, 0.95], (K, nt, 2))
    if obstacle:
        x[0, 5:8] = [1.0, 0.5]          # inside the hole → carry engages
    uv = 0.1 * rng.standard_normal((K, nt, 2))
    ud = 0.1 * rng.standard_normal((K, nt, 2))
    mask = jnp.zeros(K, bool)
    gu = jnp.asarray(rng.standard_normal((sp.n_p1, 2, 2)))
    mu_ref = _adjoint_ode_parallel(sp, gu, jnp.asarray(x),
                                   jnp.asarray(uv), jnp.asarray(ud),
                                   mask, 0.01, grid=ge)
    mu_pal = solve_adjoint_ode_pallas(ge, gu, jnp.asarray(x),
                                      jnp.asarray(uv), jnp.asarray(ud),
                                      mask, 0.01)
    d = float(jnp.max(jnp.abs(mu_ref - mu_pal)))
    assert d < TOL, d


def test_system_routes_fused_adjoint():
    """ode_backend="pallas" end-to-end: the production adjoint_rhs equals
    the gather-backend RHS (reference and consistent modes)."""
    import dataclasses
    prob = _setup()
    f = sys_mod.initial_control(prob, case=0)
    fwd = sys_mod.forward(prob, f.quad)
    b_pal = sys_mod.adjoint_rhs(prob, fwd)
    prob_g = dataclasses.replace(prob, ode_backend="gather")
    b_ref = sys_mod.adjoint_rhs(prob_g, fwd)
    scale = float(jnp.abs(b_ref).max())
    d = float(jnp.abs(b_pal - b_ref).max()) / max(scale, 1e-30)
    assert d < 1e-5, d
