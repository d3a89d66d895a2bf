"""Native-f32 chord-correction sweeps (``newton_chord_f32``).

The reuse-LU chord Newton's correction sweeps polish each step to the
stale-factor Richardson limit (~1e-3 relative) — three decades above f32
roundoff — while the convergence test is the exact f64 residual in both
modes (solve/newton.py). These tests pin: Newton still converges to the
same f64 stopping threshold, and the full GD step's J/control agree with
the f64-sweep path to well below solver accuracy (the two converged
states differ only below the 1e-9·r0 threshold, so parity is ~1e-9, not
bitwise).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod


@pytest.fixture(scope="module")
def prob_pair():
    cfg = OCPConfig(unit_square_resolution=12, ud_experiment="2_buoys",
                    viscosity=1.0)
    base = sys_mod.build_problem(cfg)
    p64 = dataclasses.replace(base, newton_reuse_lu=True,
                              newton_chord_f32=False)
    p32 = dataclasses.replace(p64, newton_chord_f32=True)
    f = sys_mod.initial_control(base, case=0)
    return p64, p32, f


def test_newton_converges_f32_chord(prob_pair):
    p64, p32, f = prob_pair
    res = sys_mod.solve_ns(p32, f.quad)
    assert bool(res.converged)
    # the stopping test is the exact f64 residual: same threshold as f64
    r64 = sys_mod.solve_ns(p64, f.quad)
    assert bool(r64.converged)
    assert float(res.residual_norm) < 1e-8
    # converged states agree to solver accuracy
    dw = float(jnp.max(jnp.abs(res.w - r64.w)))
    assert dw < 1e-8, dw


@pytest.mark.slow
def test_gd_step_parity_f32_chord(prob_pair):
    p64, p32, f = prob_pair
    lr = jnp.asarray(1.0)
    r64 = sys_mod.gd_step(p64, f, lr, use_line_search=False)
    r32 = sys_mod.gd_step(p32, f, lr, use_line_search=False)
    assert not bool(r32.diverged)
    dj = abs(float(r32.J) - float(r64.J)) / abs(float(r64.J))
    scale = float(jnp.max(jnp.abs(r64.f_new.quad)))
    dfq = float(jnp.max(jnp.abs(r32.f_new.quad - r64.f_new.quad)))
    assert dj < 1e-9, dj
    assert dfq < 1e-8 * max(scale, 1.0), (dfq, scale)
