"""Staged production driver (consolidated make_staged_pair programs) vs
the legacy per-stage loop: identical J/LR/divergence trajectories and
per-iteration buoy arrays — the dispatch-consolidation fast path must
not change semantics."""

import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod
from ocean_jax.opt.driver import run_gradient_descent


@pytest.mark.parametrize("use_line_search", [True, False])
def test_staged_driver_matches_legacy(use_line_search):
    cfg = OCPConfig(ud_experiment="2_buoys", unit_square_resolution=8,
                    use_line_search=use_line_search, num_steps=3,
                    T=0.1, dt=0.01)
    rng = np.random.default_rng(4)
    u_d = 0.05 * rng.standard_normal((2, cfg.num_time_steps, 2))
    x0 = 0.4 + 1.2 * rng.random((2, 2))
    prob = sys_mod.build_problem(cfg, u_d=u_d, x0=x0)
    f0 = sys_mod.initial_control(prob, case=0)

    r_leg = run_gradient_descent(cfg, prob, f0, staged=False,
                                 reuse_ls_forward=True, verbose=False)
    r_stg = run_gradient_descent(cfg, prob, f0, staged=True,
                                 verbose=False)

    np.testing.assert_allclose(r_stg.j_array, r_leg.j_array, rtol=1e-13)
    assert r_stg.lr == r_leg.lr
    np.testing.assert_allclose(r_stg.divs_u, r_leg.divs_u, rtol=1e-12)
    assert r_stg.inner_iterations == r_leg.inner_iterations
    assert r_stg.exit_reason == r_leg.exit_reason
    assert len(r_stg.x_array) == len(r_leg.x_array)
    for xs, xl in zip(r_stg.x_array, r_leg.x_array):
        np.testing.assert_allclose(xs, xl, rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(r_stg.f.quad),
                               np.asarray(r_leg.f.quad),
                               rtol=0, atol=1e-13)
