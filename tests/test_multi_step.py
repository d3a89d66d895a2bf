"""gd_multi_step (N GD iterations fused into one lax.scan program) vs
the per-iteration gd_step host loop: identical (J, LR, control)
trajectories — the K=10 latency-cell amortization must not change
semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod


def _setup(use_line_search):
    cfg = OCPConfig(ud_experiment="2_buoys", unit_square_resolution=8,
                    use_line_search=use_line_search, num_steps=3,
                    T=0.1, dt=0.01)
    rng = np.random.default_rng(2)
    u_d = 0.05 * rng.standard_normal((2, cfg.num_time_steps, 2))
    x0 = 0.4 + 1.2 * rng.random((2, 2))
    prob = sys_mod.build_problem(cfg, u_d=u_d, x0=x0)
    f = sys_mod.initial_control(prob, case=0)
    return prob, f, jnp.asarray(cfg.LR)


@pytest.mark.parametrize("use_line_search", [False, True])
def test_multi_step_matches_host_loop(use_line_search):
    prob, f, lr0 = _setup(use_line_search)
    n = 3

    f_h, lr_h, js, lrs = f, lr0, [], []
    for _ in range(n):
        res = sys_mod.gd_step(prob, f_h, lr_h,
                              use_line_search=use_line_search)
        assert not bool(res.diverged)
        f_h, lr_h = res.f_new, res.lr
        js.append(float(res.J))
        lrs.append(float(res.lr))

    f_s, lr_s, traj = sys_mod.gd_multi_step(
        prob, f, lr0, n, use_line_search=use_line_search)
    assert not bool(traj.diverged.any())
    np.testing.assert_allclose(np.asarray(traj.J), js, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(traj.lr), lrs, rtol=0)
    np.testing.assert_allclose(np.asarray(f_s.quad), np.asarray(f_h.quad),
                               rtol=0, atol=1e-13)
    assert float(lr_s) == float(lr_h)
    assert traj.J.shape == (n,)
