"""Config plumbing: fast-path knobs propagate and paths stay equivalent."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod


def test_fast_path_knobs_equivalent():
    rng = np.random.default_rng(0)
    K = 3
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment=f"{K}_buoys",
                    T=0.05, dt=0.005)
    seeds = 0.4 + 1.2 * rng.random((K, 2))
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    prob_ref = sys_mod.build_problem(cfg, u_d=u_d, x0=seeds)
    cfg_fast = dataclasses.replace(cfg, newton_reuse_lu=True,
                                   psrc_method="sorted")
    prob_fast = sys_mod.build_problem(cfg_fast, u_d=u_d, x0=seeds)
    assert prob_fast.newton_reuse_lu and prob_fast.psrc_method == "sorted"
    f = sys_mod.initial_control(prob_ref, case=0)
    lr = jnp.asarray(1.0)
    a = sys_mod.gd_step(prob_ref, f, lr, use_line_search=False)
    b = sys_mod.gd_step(prob_fast, f, lr, use_line_search=False)
    assert np.isclose(float(a.J), float(b.J), rtol=1e-10)
    assert np.allclose(np.asarray(a.f_new.quad), np.asarray(b.f_new.quad),
                       atol=1e-9)
