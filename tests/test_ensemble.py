"""Vmapped GD ensembles match independent sequential runs."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod
from ocean_jax.opt.ensemble import run_ensemble, stack_controls


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(1)
    K = 4
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment=f"{K}_buoys",
                    T=0.05, dt=0.005)
    seeds = 0.4 + 1.2 * rng.random((K, 2))
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    return sys_mod.build_problem(cfg, u_d=u_d, x0=seeds)


@pytest.mark.slow
def test_ensemble_matches_sequential(prob):
    cases = [sys_mod.initial_control(prob, c) for c in range(4)]
    f0 = stack_controls(cases)
    lr0 = jnp.full(4, 2.0)
    ens = run_ensemble(prob, f0, lr0, num_steps=3, use_line_search=False)
    assert ens.j_history.shape == (3, 4)
    for c in range(4):
        f = cases[c]
        lr = jnp.asarray(2.0)
        js = []
        for _ in range(3):
            res = sys_mod.gd_step(prob, f, lr, use_line_search=False)
            f, lr = res.f_new, res.lr
            js.append(float(res.J))
        assert np.allclose(np.asarray(ens.j_history[:, c]), js, rtol=1e-12)
        assert np.allclose(np.asarray(ens.f_final.quad[c]),
                           np.asarray(f.quad), atol=1e-12)


@pytest.mark.slow
def test_run_all_cases_fused():
    """The C3 study's advertised all-cases-one-XLA-program capability."""
    from ocean_jax.pipelines.initial_control import run_all_cases_fused
    cfg = OCPConfig(ud_experiment="6_buoys", unit_square_resolution=8,
                    num_steps=2, use_line_search=False, LR=1.0)
    ens, prob = run_all_cases_fused(cfg)
    assert ens.j_history.shape == (2, 4)
    assert np.isfinite(np.asarray(ens.j_history)).all()
    # the four initial controls genuinely differ
    j_last = np.asarray(ens.j_history[-1])
    assert len(np.unique(np.round(j_last, 12))) == 4


@pytest.mark.slow
def test_ensemble_lr_grid(prob):
    f0 = stack_controls([sys_mod.initial_control(prob, 0)] * 3)
    lr0 = jnp.asarray([0.5, 1.0, 2.0])
    ens = run_ensemble(prob, f0, lr0, num_steps=2, use_line_search=False)
    # different LRs → different trajectories
    j_last = np.asarray(ens.j_history[-1])
    assert len(np.unique(np.round(j_last, 12))) == 3
