"""Parity of the three primal-ODE point-eval backends and the ds library.

 * ``gather`` — index-table locate + dofmap gathers (the round-1 anchor,
   golden-parity-verified against dolfin to <1e-9),
 * ``grid``   — table-free half-grid patch stencil (ode/grideval.py),
 * ``pallas`` — fused 200-step TPU kernel (ode/pallas_ode.py), run here in
   interpret mode on the CPU mesh; double-single f32 must stay within the
   1e-9 golden bar of the f64 scan (VERDICT r1 item 4).

Escape semantics (mask/kfail/center-overwrite, ``OCP_dolfin.py:209-229``)
must agree exactly across backends.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ocean_jax.mesh import structured
from ocean_jax.fem.spaces import make_space
from ocean_jax.fem.interpolate import eval_velocity, eval_p1_tensor
from ocean_jax.ode.primal import solve_primal_ode
from ocean_jax.ode.grideval import (
    make_grideval, velocity_to_grid, grad_to_grid, eval_velocity_grid,
    eval_p1_tensor_grid)
from ocean_jax.ode.pallas_ode import solve_primal_ode_pallas
from ocean_jax.ops import doublesingle as ds


def _space(mesh):
    return make_space(mesh), make_grideval(make_space(mesh))


# ---------------------------------------------------------------------------
# double-single arithmetic
# ---------------------------------------------------------------------------

def test_doublesingle_ops_accuracy():
    rng = np.random.default_rng(1)
    a = rng.uniform(-2, 2, 5000)
    b = rng.uniform(-2, 2, 5000)
    A, B = ds.from_f64(jnp.asarray(a)), ds.from_f64(jnp.asarray(b))

    def err(x_ds, ref):
        return np.max(np.abs(np.asarray(ds.to_f64(x_ds)) - ref))

    # ~2^-48 absolute on O(1) magnitudes
    assert err(ds.add(A, B), a + b) < 1e-13
    assert err(ds.mul(A, B), a * b) < 1e-13
    assert err(ds.div(A, B), a / b) < 1e-10    # |b| can be ~1e-3
    assert bool(np.all(np.asarray(ds.gt(A, B)) == (a > b)))


def test_doublesingle_floor_near_integers():
    """The carry cases that decide which grid square owns a point."""
    base = np.floor(np.random.default_rng(2).uniform(0, 50, 3000))
    vals = np.concatenate([base, base + 1e-12, base - 1e-12,
                           np.asarray([0.0, -1e-12, 1e-12])])
    F = ds.from_f64(jnp.asarray(vals))
    f, frac = ds.floor(F)
    # reconstruct against the ds value itself (inputs round at 2^-48)
    v_ds = np.asarray(ds.to_f64(F))
    assert np.array_equal(np.asarray(f, np.float64), np.floor(v_ds))
    rec = np.asarray(f, np.float64) + np.asarray(ds.to_f64(frac))
    assert np.max(np.abs(rec - v_ds)) < 1e-14
    fr = np.asarray(ds.to_f64(frac))
    assert fr.min() >= 0.0 and fr.max() < 1.0


def test_doublesingle_survives_jit():
    """The EFTs must survive compilation (FMA contraction / algebraic
    simplification broke them before the optimization barriers)."""
    def f(a_hi, a_lo, b_hi, b_lo):
        return ds.mul((a_hi, a_lo), (b_hi, b_lo))

    a = jnp.asarray(np.random.default_rng(3).uniform(1, 2, 256))
    b = jnp.asarray(np.random.default_rng(4).uniform(1, 2, 256))
    A, B = ds.from_f64(a), ds.from_f64(b)
    ref = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    for tag, g in [("eager", f), ("jit", jax.jit(f))]:
        out = g(*A, *B)
        assert np.max(np.abs(np.asarray(ds.to_f64(out)) - ref)) < 1e-13, tag


# ---------------------------------------------------------------------------
# grid evaluator vs table-based evaluator
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,mesh", [
    ("square-right", structured.unit_square_mesh(12)),
    ("square-left", structured.unit_square_mesh(9, diagonal="left")),
    ("rect", structured.rectangle_mesh((0., 0.), (2., 2.), 8, 8)),
    ("lshape", structured.l_shape_mesh(10)),
    # gen-1 pipe capability (old_dolfinx_files/mesh_init.py:95-194) on
    # the fast backend: hole domains and locally-graded tensor grids
    ("pipe-hole", structured.pipe_mesh(resolution=14, obstacle=True)[0]),
    ("pipe-graded", structured.pipe_mesh(obstacle=False, graded=True,
                                         lc_min=0.08, lc_max=0.3)[0]),
    ("pipe-hole-graded", structured.pipe_mesh(obstacle=True, graded=True,
                                              lc_min=0.06,
                                              lc_max=0.3)[0]),
])
def test_grideval_matches_tables(name, mesh):
    rng = np.random.default_rng(0)
    sp = make_space(mesh)
    ge = make_grideval(sp)
    u = jnp.asarray(rng.standard_normal((sp.n_p2, 2)))
    g = jnp.asarray(rng.standard_normal((sp.n_p1, 2, 2)))
    xmin, ymin, xmax, ymax = sp.locator.extent
    pts = jnp.asarray(rng.uniform([xmin - 0.2, ymin - 0.2],
                                  [xmax + 0.2, ymax + 0.2], (3000, 2)))
    v1, in1 = eval_velocity(sp, u, pts)
    v2, in2 = eval_velocity_grid(ge, velocity_to_grid(ge, u), pts)
    assert bool(jnp.all(in1 == in2))
    assert float(jnp.max(jnp.abs(jnp.where(in1[:, None], v1 - v2, 0.0)))) \
        < 1e-12
    g1, _ = eval_p1_tensor(sp, g, pts)
    g2, _ = eval_p1_tensor_grid(ge, grad_to_grid(ge, g), pts)
    m = in1[:, None, None]
    assert float(jnp.max(jnp.abs(jnp.where(m, g1 - g2, 0.0)))) < 1e-12


# ---------------------------------------------------------------------------
# primal-ODE backend equivalence (with escapes)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,mesh,center", [
    ("square", structured.rectangle_mesh((0., 0.), (2., 2.), 8, 8),
     [1.0, 1.0]),
    ("lshape", structured.l_shape_mesh(8), [1.0, 0.5]),
])
@pytest.mark.slow
def test_primal_ode_backends_agree(name, mesh, center):
    rng = np.random.default_rng(3)
    sp = make_space(mesh)
    ge = make_grideval(sp)
    u = jnp.asarray(0.9 * rng.standard_normal((sp.n_p2, 2)))
    K, nt, h = 37, 50, 0.02
    x0 = jnp.asarray(rng.uniform(0.1, 1.9, (K, 2)))
    center = jnp.asarray(center)

    ref = solve_primal_ode(sp, u, x0, h, nt, center)
    assert int(ref.mask.sum()) > 0        # the test must exercise escapes

    grid = solve_primal_ode(sp, u, x0, h, nt, center, grid=ge)
    pal = solve_primal_ode_pallas(sp, ge, u, x0, h, nt, center)
    for tag, r, tol in [("grid", grid, 1e-12), ("pallas", pal, 1e-9)]:
        assert bool(jnp.all(r.mask == ref.mask)), tag
        assert bool(jnp.all(r.kfail == ref.kfail)), tag
        assert float(jnp.max(jnp.abs(r.x - ref.x))) < tol, tag
        assert float(jnp.max(jnp.abs(r.u_values - ref.u_values))) < tol, tag
        assert float(jnp.max(jnp.abs(r.x_raw - ref.x_raw))) < tol, tag


@pytest.mark.parametrize("name,mesh", [
    ("pipe-hole", structured.pipe_mesh(resolution=14, obstacle=True)[0]),
    ("pipe-graded", structured.pipe_mesh(obstacle=True, graded=True,
                                         lc_min=0.06, lc_max=0.3)[0]),
])
@pytest.mark.slow
def test_primal_ode_grid_backend_pipe_domains(name, mesh):
    """gather vs grid vs pallas parity on the gen-1 pipe domains (hole +
    graded) — trajectories that skirt the obstacle and escape through it
    must agree exactly (escape = in_domain with the active-square
    condition; the Pallas kernel reproduces it via the ds circle test +
    one-hot mask-plane lookup, round-3 tail)."""
    rng = np.random.default_rng(7)
    sp = make_space(mesh)
    ge = make_grideval(sp)
    u = jnp.asarray(0.6 * rng.standard_normal((sp.n_p2, 2)))
    K, nt, h = 29, 40, 0.02
    x0 = jnp.asarray(rng.uniform(0.05, 1.95, (K, 2)))
    center = jnp.asarray([1.0, 1.0])

    ref = solve_primal_ode(sp, u, x0, h, nt, center)
    assert int(ref.mask.sum()) > 0        # escapes exercised
    grid = solve_primal_ode(sp, u, x0, h, nt, center, grid=ge)
    assert bool(jnp.all(grid.mask == ref.mask))
    assert bool(jnp.all(grid.kfail == ref.kfail))
    assert float(jnp.max(jnp.abs(grid.x - ref.x))) < 1e-12
    assert float(jnp.max(jnp.abs(grid.u_values - ref.u_values))) < 1e-12

    pal = solve_primal_ode_pallas(sp, ge, u, x0, h, nt, center)
    assert bool(jnp.all(pal.mask == ref.mask))
    assert bool(jnp.all(pal.kfail == ref.kfail))
    assert float(jnp.max(jnp.abs(pal.x - ref.x))) < 1e-9
    assert float(jnp.max(jnp.abs(pal.u_values - ref.u_values))) < 1e-9


# ---------------------------------------------------------------------------
# whole-pipeline equivalence: gd_step under each ode_backend
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_gd_step_ode_backends_agree():
    from ocean_jax import system as sys_mod
    from ocean_jax.config import OCPConfig

    cfg = OCPConfig(ud_experiment="2_buoys", unit_square_resolution=8,
                    num_steps=1, use_line_search=True)
    results = {}
    for backend in ["gather", "grid", "pallas"]:
        prob = sys_mod.build_problem(
            dataclasses.replace(cfg, ode_backend=backend))
        f = sys_mod.initial_control(prob, case=0)
        res = sys_mod.gd_step(prob, f, jnp.asarray(5.0))
        results[backend] = res
    j0 = float(results["gather"].J)
    for backend in ["grid", "pallas"]:
        # pallas on XLA:CPU runs in interpret mode where the double-single
        # EFTs can degrade to f32-level under fusion changes (measured
        # 1e-14 today, bounded 2e-6 in test_pallas_eval.py) — hold the
        # interpreted backend to the f32 floor only; hardware parity is
        # pinned at 7e-15 by the TPU runs (results/flagship_10k)
        tol = 1e-9 if backend == "grid" else 3e-6
        dj = abs(float(results[backend].J) - j0) / abs(j0)
        assert dj < tol, (backend, dj)
        dg = float(jnp.max(jnp.abs(results[backend].grad.quad
                                   - results["gather"].grad.quad)))
        assert dg < tol, (backend, dg)
