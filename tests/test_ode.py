"""ODE layer tests: integration accuracy + exact escape-mask semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.mesh import rectangle_mesh
from ocean_jax.fem import make_space
from ocean_jax.fem.interpolate import interpolate_p2
from ocean_jax.ode import solve_primal_ode, solve_adjoint_ode


def _space(n=8):
    return make_space(rectangle_mesh((0.0, 0.0), (2.0, 2.0), n, n))


def test_euler_matches_reference_loop():
    """The scan reproduces the reference's Python loop bit-for-bit
    (OCP_dolfin.py:201-230) on an in-domain trajectory."""
    space = _space()
    # affine field: represented exactly in P2, smooth trajectories
    def f(x):
        return np.stack([0.1 + 0.05 * x[:, 1], 0.05 * (1 - x[:, 0] / 2)],
                        axis=1)
    u = interpolate_p2(space, f)
    h, nt = 0.005, 200
    x0 = np.array([[0.3, 0.4], [1.2, 1.5]])
    res = solve_primal_ode(space, u, jnp.asarray(x0), h, nt,
                           jnp.asarray([1.0, 1.0]))
    # reference loop in numpy
    x = np.zeros((2, nt, 2)); x[:, 0] = x0
    uv = np.zeros((2, nt, 2))
    for b in range(2):
        for k in range(nt - 1):
            val = f(x[b, k][None])[0]
            x[b, k + 1] = x[b, k] + h * val
            uv[b, k] = val
        uv[b, nt - 1] = f(x[b, nt - 1][None])[0]
    assert np.allclose(np.asarray(res.x), x, atol=1e-13)
    assert np.allclose(np.asarray(res.u_values), uv, atol=1e-13)
    assert not res.mask.any()


def test_escape_semantics():
    """Escaped buoys: trajectory → center, mask set, u_values pattern
    (zeros at k_fail, u(center) at k_fail+1) per OCP_dolfin.py:209-229."""
    space = _space()
    # strong rightward flow pushes buoys out through x=2
    def f(x):
        return np.stack([np.full(len(x), 2.0), np.zeros(len(x))], axis=1)
    u = interpolate_p2(space, f)
    h, nt = 0.05, 40
    center = jnp.asarray([1.0, 1.0])
    x0 = np.array([[1.9, 1.0],    # escapes quickly
                   [0.1, 1.0]])   # escapes later
    res = solve_primal_ode(space, u, jnp.asarray(x0), h, nt, center)
    x, uv, mask = (np.asarray(res.x), np.asarray(res.u_values),
                   np.asarray(res.mask))
    assert mask.all()
    # entire trajectory overwritten with the center
    assert np.allclose(x, 1.0)
    for b, start in enumerate([1.9, 0.1]):
        # buoy exits when start + k*h*2 > 2 → first failing eval index
        kf = next(k for k in range(nt) if start + 2.0 * h * k > 2.0)
        assert np.allclose(uv[b, :kf], [2.0, 0.0])       # recorded before
        assert np.allclose(uv[b, kf], 0.0)               # break step
        assert np.allclose(uv[b, kf + 1], [2.0, 0.0])    # u(center)
        assert np.allclose(uv[b, kf + 2:], 0.0)


def test_last_step_runout_unmasked():
    """If only the final evaluation at x[nt-1] leaves the domain, the buoy
    is NOT masked; u[nt-1]=0 and x[nt-1]=center (OCP_dolfin.py:223-229)."""
    space = _space()
    def f(x):
        return np.stack([np.full(len(x), 1.0), np.zeros(len(x))], axis=1)
    u = interpolate_p2(space, f)
    h, nt = 0.1, 5                     # x: 1.65,1.75,1.85,1.95,2.05
    res = solve_primal_ode(space, u, jnp.asarray([[1.65, 1.0]]), h, nt,
                           jnp.asarray([1.0, 1.0]))
    assert not res.mask.any()
    x, uv = np.asarray(res.x)[0], np.asarray(res.u_values)[0]
    assert np.allclose(x[:4, 0], [1.65, 1.75, 1.85, 1.95])
    assert np.allclose(x[4], [1.0, 1.0])          # center
    assert np.allclose(uv[4], 0.0)
    assert np.allclose(uv[:4], [1.0, 0.0])


def test_adjoint_ode_matches_reference_loop():
    space = _space()
    rng = np.random.default_rng(0)
    nt, h, K = 20, 0.01, 3
    # synthetic P1 gradient field (linear per component = exact in P1)
    gmat = rng.standard_normal((2, 2)) * 0.3
    g = np.tile(gmat, (space.n_p1, 1, 1))
    x = 0.5 + 0.8 * rng.random((K, nt, 2))
    uv = rng.standard_normal((K, nt, 2))
    ud = rng.standard_normal((K, nt, 2))
    mask = np.array([False, True, False])
    mu = solve_adjoint_ode(space, jnp.asarray(g), jnp.asarray(x),
                           jnp.asarray(uv), jnp.asarray(ud),
                           jnp.asarray(mask), h)
    # reference recursion (OCP_dolfin.py:234-252)
    mu_ref = np.zeros((K, nt, 2))
    for b in range(K):
        if mask[b]:
            continue
        for k in range(nt - 2, -1, -1):
            mu_ref[b, k] = mu_ref[b, k + 1] - h * gmat.T @ (
                (uv[b, k + 1] - ud[b, k + 1]) - mu_ref[b, k + 1])
    assert np.allclose(np.asarray(mu), mu_ref, atol=1e-12)
    assert np.allclose(np.asarray(mu)[1], 0.0)


@pytest.mark.slow
def test_parallel_adjoint_matches_sequential():
    """The associative-scan adjoint ODE equals the sequential recursion,
    including the out-of-domain ∇u-reuse quirk and masked buoys."""
    space = _space()
    rng = np.random.default_rng(3)
    K, nt, h = 5, 30, 0.01
    g = jnp.asarray(rng.standard_normal((space.n_p1, 2, 2)) * 0.3)
    x = jnp.asarray(0.3 + 1.4 * rng.random((K, nt, 2)))
    x = x.at[2, 10].set(jnp.array([5.0, 5.0]))   # out-of-domain points
    x = x.at[2, 11].set(jnp.array([5.0, 5.0]))
    uv = jnp.asarray(rng.standard_normal((K, nt, 2)))
    ud = jnp.asarray(rng.standard_normal((K, nt, 2)))
    mask = jnp.asarray([False, True, False, False, False])
    mu_seq = solve_adjoint_ode(space, g, x, uv, ud, mask, h, method="scan")
    mu_par = solve_adjoint_ode(space, g, x, uv, ud, mask, h,
                               method="parallel")
    assert float(jnp.abs(mu_seq - mu_par).max()) < 1e-14
