"""Parity of the initial-control presets with the reference expressions.

Pins all q₀ cases to ``initial_control_test.py:30-42`` (cases 0-2 + the
constant else-branch) and ``Pipeline_limits.py:123`` (case 4), evaluated at
the Γ₁ boundary quadrature points — exactly the values dolfin's quadrature
of the Expression sees.
"""

import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod


@pytest.fixture(scope="module")
def prob():
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment="2_buoys",
                    T=0.05, dt=0.005)
    rng = np.random.default_rng(0)
    u_d = np.zeros((2, cfg.num_time_steps, 2))
    x0 = 0.3 + 1.4 * rng.random((2, 2))
    return sys_mod.build_problem(cfg, u_d=u_d, x0=x0)


def _reference_q0(case, x):
    """The reference Expression strings, verbatim semantics."""
    px, py = np.pi * x[:, 0], np.pi * x[:, 1]
    if case == 0:    # initial_control_test.py:32-33 (= OCP_dolfin.py:143-145)
        return np.stack([-np.cos(px) * np.sin(py),
                         np.sin(px) * np.cos(py)], axis=1)
    if case == 1:    # :35-36
        return np.zeros((len(x), 2))
    if case == 2:    # :37-39 — component-swapped Taylor–Green
        return np.stack([np.sin(px) * np.cos(py),
                         -np.cos(px) * np.sin(py)], axis=1)
    if case == 3:    # :40-42 (else branch)
        return np.full((len(x), 2), 0.1)
    if case == 4:    # Pipeline_limits.py:123
        return np.stack([np.full(len(x), 0.1), np.zeros(len(x))], axis=1)
    raise AssertionError(case)


@pytest.mark.parametrize("case", [0, 1, 2, 3, 4])
def test_initial_control_matches_reference(prob, case):
    ctrl = sys_mod.initial_control(prob, case=case)
    pts = np.asarray(prob.bq.points).reshape(-1, 2)
    got = np.asarray(ctrl.quad).reshape(-1, 2)
    want = _reference_q0(case, pts)
    assert np.allclose(got, want, atol=1e-14), (
        f"case {case}: max err {np.abs(got - want).max()}")


def test_case2_is_not_negated_tg(prob):
    """Regression: case 2 is the SWAPPED Taylor–Green, not −TG (they differ
    everywhere off the diagonal)."""
    ctrl = sys_mod.initial_control(prob, case=2)
    neg_tg = -np.asarray(sys_mod.initial_control(prob, case=0).quad)
    assert not np.allclose(np.asarray(ctrl.quad), neg_tg)
