"""Config plumbing: fast-path knobs propagate and paths stay equivalent."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod


@pytest.mark.parametrize("psrc", ["sorted", "ozaki", "ozaki_pallas",
                                  "fused"])
@pytest.mark.slow
def test_fast_path_knobs_equivalent(psrc):
    rng = np.random.default_rng(0)
    K = 3
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment=f"{K}_buoys",
                    T=0.05, dt=0.005)
    seeds = 0.4 + 1.2 * rng.random((K, 2))
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    prob_ref = sys_mod.build_problem(cfg, u_d=u_d, x0=seeds)
    cfg_fast = dataclasses.replace(cfg, newton_reuse_lu=True,
                                   psrc_method=psrc)
    prob_fast = sys_mod.build_problem(cfg_fast, u_d=u_d, x0=seeds)
    assert prob_fast.newton_reuse_lu and prob_fast.psrc_method == psrc
    f = sys_mod.initial_control(prob_ref, case=0)
    lr = jnp.asarray(1.0)
    a = sys_mod.gd_step(prob_ref, f, lr, use_line_search=False)
    b = sys_mod.gd_step(prob_fast, f, lr, use_line_search=False)
    # "fused" runs its ds location in Pallas interpret mode on CPU, where
    # XLA:CPU fusion can degrade the EFTs to f32-level (same caveat as
    # tests/test_ode_backends.py:205-210); hardware parity is 1e-12-level
    tol_j, tol_f = (3e-6, 1e-6) if psrc == "fused" else (1e-10, 1e-9)
    assert np.isclose(float(a.J), float(b.J), rtol=tol_j)
    assert np.allclose(np.asarray(a.f_new.quad), np.asarray(b.f_new.quad),
                       atol=tol_f)


@pytest.mark.slow
def test_dense_apply_inverse_equivalent():
    """dense_apply="inverse" (explicit f32 inverse, matmul applies)
    reproduces the LU-apply GD step: refinement absorbs the f32
    preconditioner difference on both paths."""
    rng = np.random.default_rng(2)
    K = 3
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment=f"{K}_buoys",
                    T=0.05, dt=0.005, newton_reuse_lu=True)
    seeds = 0.4 + 1.2 * rng.random((K, 2))
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    prob_lu = sys_mod.build_problem(cfg, u_d=u_d, x0=seeds)
    prob_inv = sys_mod.build_problem(
        dataclasses.replace(cfg, dense_apply="inverse"), u_d=u_d, x0=seeds)
    from ocean_jax.ops.linalg import InvSolver
    assert isinstance(prob_inv.fac0, InvSolver)
    f = sys_mod.initial_control(prob_lu, case=0)
    lr = jnp.asarray(1.0)
    a = sys_mod.gd_step(prob_lu, f, lr, use_line_search=True)
    b = sys_mod.gd_step(prob_inv, f, lr, use_line_search=True)
    assert np.isclose(float(a.J), float(b.J), rtol=1e-10)
    assert np.allclose(np.asarray(a.f_new.quad), np.asarray(b.f_new.quad),
                       atol=1e-9)
    assert not bool(b.diverged)


def test_invert32_accuracy():
    """In-program chunked inverse: ‖I − A·inv(A)‖∞ at f32 level, chunk
    padding handled (n not a multiple of chunk)."""
    from ocean_jax.ops.linalg import invert32
    rng = np.random.default_rng(3)
    n = 173
    a = jnp.asarray(rng.standard_normal((n, n)) + n * np.eye(n))
    inv = invert32(a, chunk=64).ainv
    resid = np.abs(np.asarray(a.astype(jnp.float32) @ inv) - np.eye(n))
    assert resid.max() < 1e-4


@pytest.mark.slow
def test_reuse_ls_forward_bit_identical():
    """Reusing the accepted line-search probe's forward state reproduces
    the reference path bit-for-bit (same control → same deterministic
    solve), while skipping one NS+ODE solve per iteration."""
    from ocean_jax.opt.driver import run_gradient_descent
    rng = np.random.default_rng(1)
    K = 2
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment="2_buoys",
                    T=0.05, num_steps=4, use_line_search=True, LR=2.0)
    seeds = 0.4 + 1.2 * rng.random((K, 2))
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    prob = sys_mod.build_problem(cfg, u_d=u_d, x0=seeds)
    f0 = sys_mod.initial_control(prob, 0)
    a = run_gradient_descent(cfg, prob, f0, reuse_ls_forward=False,
                             verbose=False)
    b = run_gradient_descent(cfg, prob, f0, reuse_ls_forward=True,
                             verbose=False)
    assert a.j_array == b.j_array
    assert float(jnp.abs(a.f.quad - b.f.quad).max()) == 0.0


@pytest.mark.slow
def test_line_search_floors_at_lr_min_without_respinning():
    """Unsatisfiable Armijo condition (huge c): the LS must decay LR to
    LR_MIN, probe the floor ONCE, and accept — not burn max_ls_iters
    identical re-probes (the reference's while loop would spin forever at
    the floor, OCP_dolfin.py:415; our early accept is observably identical
    to the old safety-bound exit, just without ~60 redundant solves)."""
    rng = np.random.default_rng(3)
    K = 2
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment=f"{K}_buoys",
                    T=0.05, dt=0.005)
    seeds = 0.4 + 1.2 * rng.random((K, 2))
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    prob = sys_mod.build_problem(cfg, u_d=u_d, x0=seeds)
    f = sys_mod.initial_control(prob, case=0)
    res = sys_mod.gd_step(prob, f, jnp.asarray(5.0), use_line_search=True,
                          c_armijo=1e12, max_ls_iters=80)
    assert float(res.lr) == 1e-6                 # floored at LR_MIN
    # 23 halvings 5.0 -> 1e-6 plus the floor probe; nowhere near 80
    assert int(res.inner_iterations) == 24
