"""Fused Pallas point-source kernel (adjoint/pallas_psrc.py): parity with
the f64 scatter path on system-consistent inputs, the interpolation
transpose identity, L-shape domains, and domain gating.

System-consistent means the reference invariant holds: an unmasked buoy's
trajectory points are ALL inside the domain (one failed evaluation masks
the buoy and overwrites its whole trajectory with the domain center,
OCP_dolfin.py:209-229), and ``u_values[k] == u(x_k)`` from the same
evaluator. The fused method's γ is built from ``u_values`` directly, so
its tests construct inputs the way ``system._forward`` does instead of
planting artificial out-of-domain points on unmasked buoys.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.mesh import rectangle_mesh, l_shape_mesh
from ocean_jax.fem import make_space
from ocean_jax.fem.interpolate import eval_velocity, interpolate_p2
from ocean_jax.adjoint import point_source_rhs
from ocean_jax.ode.grideval import make_grideval

# CPU runs the kernel in (eager) interpret mode, where XLA:CPU fusion can
# degrade the double-single location EFTs to f32 level (the 2e-6 bound of
# tests/test_pallas_eval.py); on TPU hardware the kernel is exact to the
# Ozaki slicing tail (~1e-12 absolute).
_TOL = 1e-12 if jax.default_backend() == "tpu" else 5e-6


def _system_consistent_inputs(space, rng, K=9, nt=30, h=0.01,
                              lo=0.2, hi=1.8, mask_idx=(4,)):
    """Trajectories with the reference escape invariant: unmasked buoys
    fully inside; masked buoys parked at the center (the reference's
    trajectory overwrite)."""
    center = jnp.asarray([1.0, 1.0])
    u = interpolate_p2(space, lambda c: np.stack(
        [0.3 * np.sin(c[:, 1]), -0.3 * np.cos(c[:, 0])], axis=1))
    x = jnp.asarray(lo + (hi - lo) * rng.random((K, nt, 2)))
    mask = np.zeros(K, dtype=bool)
    mask[list(mask_idx)] = True
    x = jnp.where(jnp.asarray(mask)[:, None, None], center, x)
    u_values, _ = eval_velocity(space, u, x)
    mu = jnp.asarray(rng.standard_normal((K, nt, 2)))
    u_d = jnp.asarray(rng.standard_normal((K, nt, 2)))
    return u, x, u_values, mu, u_d, jnp.asarray(mask), center, h


@pytest.mark.slow
def test_fused_matches_scatter_square():
    space = make_space(rectangle_mesh((0.0, 0.0), (2.0, 2.0), 8, 8))
    grid = make_grideval(space)
    rng = np.random.default_rng(11)
    u, x, uv, mu, u_d, mask, center, h = _system_consistent_inputs(
        space, rng)
    b_ref = point_source_rhs(space, u, x, mu, u_d, mask, h, center,
                             method="scatter")
    b_fused = point_source_rhs(space, u, x, mu, u_d, mask, h, center,
                               method="fused", grid=grid, u_values=uv)
    scale = float(jnp.abs(b_ref).max())
    assert float(jnp.abs(b_fused - b_ref).max()) < _TOL * max(scale, 1.0)


@pytest.mark.slow
def test_fused_matches_scatter_lshape():
    """L-shape notch projection inside the kernel matches locate_points."""
    space = make_space(l_shape_mesh(12))
    grid = make_grideval(space)
    rng = np.random.default_rng(13)
    center = jnp.asarray(space.locator.origin) + 0.25 * jnp.asarray(
        [space.locator.extent[2] - space.locator.origin[0],
         space.locator.extent[3] - space.locator.origin[1]])
    K, nt, h = 6, 20, 0.01
    u = interpolate_p2(space, lambda c: np.stack(
        [0.2 * c[:, 1], -0.2 * c[:, 0]], axis=1))
    # keep unmasked trajectories in the always-inside lower-left quadrant
    xmin, ymin, xmax, ymax = (float(v) for v in space.locator.extent)
    x = jnp.asarray(np.stack(
        [xmin + 0.05 + 0.4 * (xmax - xmin) * rng.random((K, nt)),
         ymin + 0.05 + 0.4 * (ymax - ymin) * rng.random((K, nt))], axis=-1))
    mask = jnp.asarray([False, False, True, False, False, False])
    x = jnp.where(mask[:, None, None], center, x)
    uv, inside = eval_velocity(space, u, x)
    assert bool(inside.all())
    mu = jnp.asarray(rng.standard_normal((K, nt, 2)))
    u_d = jnp.asarray(rng.standard_normal((K, nt, 2)))
    b_ref = point_source_rhs(space, u, x, mu, u_d, mask, h, center,
                             method="scatter")
    b_fused = point_source_rhs(space, u, x, mu, u_d, mask, h, center,
                               method="fused", grid=grid, u_values=uv)
    scale = float(jnp.abs(b_ref).max())
    assert float(jnp.abs(b_fused - b_ref).max()) < _TOL * max(scale, 1.0)


@pytest.mark.slow
def test_fused_transpose_identity():
    """⟨PS(γ at p), w⟩ == γ · w(p) for the fused kernel too (SURVEY §7.3):
    u = 0, μ = 0, u_d = γ/h plants exact γ sources."""
    space = make_space(rectangle_mesh((0.0, 0.0), (2.0, 2.0), 6, 6))
    grid = make_grideval(space)
    rng = np.random.default_rng(5)
    w_vel = jnp.asarray(rng.standard_normal((space.n_p2, 2)))
    pts = jnp.asarray(0.2 + 1.6 * rng.random((2, 5, 2)))
    gamma = jnp.asarray(rng.standard_normal((2, 5, 2)))
    b = point_source_rhs(space, jnp.zeros((space.n_p2, 2)), pts,
                         jnp.zeros((2, 5, 2)), gamma,
                         jnp.asarray([False, False]), 1.0,
                         jnp.asarray([1.0, 1.0]), method="fused",
                         grid=grid, u_values=jnp.zeros((2, 5, 2)))
    lhs = float(b[: 2 * space.n_p2] @ w_vel.reshape(-1))
    w_at_p, _ = eval_velocity(space, w_vel, pts)
    rhs = float(jnp.sum(gamma * w_at_p))
    assert np.isclose(lhs, rhs, rtol=max(_TOL, 1e-10))


@pytest.mark.slow
def test_fused_matches_scatter_graded():
    """Graded tensor mesh (gen-1 pipe capability,
    old_dolfinx_files/mesh_init.py:145-165): the fused kernel locates
    through the in-kernel ds-exact searchsorted (shared with the primal
    ODE kernel) and matches the f64 scatter path."""
    from ocean_jax.mesh import structured
    mesh, _ = structured.pipe_mesh(obstacle=False, graded=True,
                                   lc_min=0.08, lc_max=0.3)
    space = make_space(mesh)
    grid = make_grideval(space)
    rng = np.random.default_rng(17)
    u, x, uv, mu, u_d, mask, center, h = _system_consistent_inputs(
        space, rng, K=7, nt=25)
    b_ref = point_source_rhs(space, u, x, mu, u_d, mask, h, center,
                             method="scatter")
    b_fused = point_source_rhs(space, u, x, mu, u_d, mask, h, center,
                               method="fused", grid=grid, u_values=uv)
    scale = float(jnp.abs(b_ref).max())
    assert float(jnp.abs(b_fused - b_ref).max()) < _TOL * max(scale, 1.0)


@pytest.mark.slow
def test_fused_matches_scatter_hole():
    """Obstacle (hole) domain: every γ≠0 point lies in an active cell
    (reference invariant — an escaped buoy's lanes are zeroed), so the
    kernel needs no in-hole handling; in-hole image nodes are dropped by
    the dof_to_node gather. The masked buoy parked at the center and the
    unmasked trajectories away from the (0.2, 0.2) r=0.05 obstacle must
    both match the scatter path."""
    from ocean_jax.mesh import structured
    mesh, _ = structured.pipe_mesh(resolution=12, obstacle=True)
    space = make_space(mesh)
    grid = make_grideval(space)
    assert space.locator.hole is not None
    rng = np.random.default_rng(19)
    # trajectories in [0.5, 1.8]²: inside the pipe, clear of the obstacle
    u, x, uv, mu, u_d, mask, center, h = _system_consistent_inputs(
        space, rng, K=8, nt=25, lo=0.5, hi=1.8)
    b_ref = point_source_rhs(space, u, x, mu, u_d, mask, h, center,
                             method="scatter")
    b_fused = point_source_rhs(space, u, x, mu, u_d, mask, h, center,
                               method="fused", grid=grid, u_values=uv)
    scale = float(jnp.abs(b_ref).max())
    assert float(jnp.abs(b_fused - b_ref).max()) < _TOL * max(scale, 1.0)


def test_fused_gating():
    space = make_space(rectangle_mesh((0.0, 0.0), (2.0, 2.0), 4, 4))
    grid = make_grideval(space)
    z = jnp.zeros((1, 3, 2))
    args = (space, jnp.zeros((space.n_p2, 2)), 0.5 + z, z, z,
            jnp.asarray([False]), 1.0, jnp.asarray([1.0, 1.0]))
    with pytest.raises(ValueError):
        point_source_rhs(*args, method="fused")          # missing tables
    # round-5: active_t (consistent-adjoint window) is supported by the
    # fused kernel — the call must succeed and gate lanes like ~mask
    b = point_source_rhs(*args, method="fused", grid=grid,
                         u_values=z, active_t=jnp.ones((1, 3), bool))
    assert bool(jnp.isfinite(b).all())


@pytest.mark.slow
def test_fused_last_step_outside_unmasked():
    """A buoy whose FINAL evaluation fails is NOT masked: the primal
    stores u_values[nt-1]=0 / x[nt-1]=center, and the reference's psrc
    loop then re-evaluates at the stored center, getting u(center) != 0
    (OCP_dolfin.py:222-228 vs :357-360). The fused kernel's
    gamma-from-u_values shortcut missed exactly this case (latent until
    the round-5 consistent-mode hardware cell caught a 1e-2 deviation);
    the at-center substitution fixes it in both modes."""
    import dataclasses
    from ocean_jax.config import OCPConfig
    from ocean_jax import system as sys_mod, control as ctrl_mod
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    K = 64
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment=f"{K}_buoys",
                    T=0.25, dt=0.005, ode_backend="pallas")
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    x0 = np.column_stack([1.2 + 0.7 * rng.random(K),
                          0.3 + 1.4 * rng.random(K)])
    prob = sys_mod.build_problem(cfg, u_d=u_d, x0=x0)
    f = ctrl_mod.constant(prob.space, prob.bq, [3.0, 0.0])
    p_sc = dataclasses.replace(prob, psrc_method="scatter",
                               ode_backend="gather")
    fwd = sys_mod.forward(p_sc, f.quad)
    # the setup must actually exercise the edge: an UNMASKED buoy parked
    # at the center in its final slot
    center_last = ((np.asarray(fwd.x)[:, -1] ==
                    np.asarray(prob.center)).all(axis=1)
                   & ~np.asarray(fwd.mask))
    assert center_last.any(), "setup no longer hits the edge case"
    b_sc = sys_mod.adjoint_rhs(p_sc, fwd)
    b_fu = sys_mod.adjoint_rhs(
        dataclasses.replace(prob, psrc_method="fused"), fwd)
    d = float(jnp.abs(b_fu - b_sc).max() / jnp.abs(b_sc).max())
    assert d < 5e-6, d          # CPU-interpret EFT bound; ~1e-14 exact
