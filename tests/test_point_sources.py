"""Point-source RHS: binned/ozaki MXU paths equal direct scatter;
transpose property against interpolation."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.mesh import rectangle_mesh
from ocean_jax.fem import make_space
from ocean_jax.fem.interpolate import eval_velocity, interpolate_p2
from ocean_jax.adjoint import point_source_rhs
from ocean_jax.ops.scatter import binned_segment_sum, ozaki_segment_sum


def test_binned_segment_sum_exact():
    rng = np.random.default_rng(0)
    m, s, d = 10000, 57, 12
    ids = jnp.asarray(rng.integers(0, s, m))
    vals = jnp.asarray(rng.standard_normal((m, d)))
    out = binned_segment_sum(ids, vals, s, chunk=1024)
    ref = np.zeros((s, d))
    np.add.at(ref, np.asarray(ids), np.asarray(vals))
    assert np.allclose(np.asarray(out), ref, atol=1e-12)


@pytest.mark.parametrize("m,s,chunk", [(10000, 57, 1024), (3000, 2048, 512),
                                       (2048, 7, 2048)])
def test_ozaki_segment_sum_exact(m, s, chunk):
    """bf16-sliced MXU segment sum reproduces the exact f64 result
    (hot-segment collisions included: s=7 forces ~430 collisions/bin)."""
    rng = np.random.default_rng(3)
    d = 12
    ids = jnp.asarray(rng.integers(0, s, m))
    # mixed magnitudes stress the shared-exponent slicing
    vals = jnp.asarray(rng.standard_normal((m, d))
                       * 10.0 ** rng.integers(-6, 3, (m, 1)))
    out = ozaki_segment_sum(ids, vals, s, chunk=chunk)
    ref = np.zeros((s, d))
    np.add.at(ref, np.asarray(ids), np.asarray(vals, dtype=np.float64))
    scale = np.abs(np.asarray(vals)).max(axis=0)
    assert np.abs(np.asarray(out) - ref).max() < 1e-12 * scale.max()


@pytest.mark.parametrize("m,s,chunk,s_tile", [(5000, 57, 1024, 256),
                                              (3000, 2000, 512, 1024)])
def test_ozaki_pallas_matches_xla(m, s, chunk, s_tile):
    """The Pallas kernel (interpret mode on CPU) reproduces the XLA ozaki
    path and the exact f64 reference, across segment tiling and chunk
    padding."""
    from ocean_jax.ops.psum_pallas import ozaki_segment_sum_pallas
    rng = np.random.default_rng(7)
    d = 12
    ids = jnp.asarray(rng.integers(0, s, m))
    vals = jnp.asarray(rng.standard_normal((m, d))
                       * 10.0 ** rng.integers(-5, 3, (m, 1)))
    out = ozaki_segment_sum_pallas(ids, vals, s, chunk=chunk,
                                   s_tile=s_tile, interpret=True)
    ref = np.zeros((s, d))
    np.add.at(ref, np.asarray(ids), np.asarray(vals, dtype=np.float64))
    scale = np.abs(np.asarray(vals)).max()
    assert np.abs(np.asarray(out) - ref).max() < 1e-12 * scale
    xla = ozaki_segment_sum(ids, vals, s, chunk=chunk)
    assert np.abs(np.asarray(out) - np.asarray(xla)).max() < 1e-12 * scale


def test_ozaki_segment_sum_empty_and_padding_bins():
    ids = jnp.asarray([0, 0, 2, 3])            # bin 1 empty; 3 == S → drop
    vals = jnp.asarray([[1.0], [2.0], [4.0], [99.0]])
    out = np.asarray(ozaki_segment_sum(ids, vals, 3, chunk=4))
    assert np.allclose(out, [[3.0], [0.0], [4.0]])


@pytest.mark.parametrize("method", ["binned", "sorted", "ozaki",
                                    "ozaki_pallas"])
def test_fast_methods_match_scatter(method):
    space = make_space(rectangle_mesh((0.0, 0.0), (2.0, 2.0), 8, 8))
    rng = np.random.default_rng(1)
    K, nt, h = 7, 25, 0.01
    u = interpolate_p2(space, lambda c: np.stack(
        [0.1 * c[:, 1], -0.1 * c[:, 0]], axis=1))
    x = jnp.asarray(0.2 + 1.6 * rng.random((K, nt, 2)))
    x = x.at[3, 5].set(jnp.array([9.0, 9.0]))   # out-of-domain → center
    mu = jnp.asarray(rng.standard_normal((K, nt, 2)))
    u_d = jnp.asarray(rng.standard_normal((K, nt, 2)))
    mask = jnp.asarray([False] * 6 + [True])
    center = jnp.asarray([1.0, 1.0])
    b1 = point_source_rhs(space, u, x, mu, u_d, mask, h, center,
                          method="scatter")
    b2 = point_source_rhs(space, u, x, mu, u_d, mask, h, center,
                          method=method)
    assert np.allclose(np.asarray(b1), np.asarray(b2), atol=1e-13)


def test_point_source_is_interpolation_transpose():
    """⟨PS(γ at p), w⟩ == γ · w(p): the defining adjoint identity
    (SURVEY §7.3 "PointSource transpose")."""
    space = make_space(rectangle_mesh((0.0, 0.0), (2.0, 2.0), 6, 6))
    rng = np.random.default_rng(2)
    w_vel = jnp.asarray(rng.standard_normal((space.n_p2, 2)))
    pts = jnp.asarray(0.2 + 1.6 * rng.random((1, 4, 2)))
    gamma = rng.standard_normal((1, 4, 2))
    # b with u_d = gamma/h, u = 0, mu = 0 → gamma sources exactly
    b = point_source_rhs(space, jnp.zeros((space.n_p2, 2)), pts,
                         jnp.zeros((1, 4, 2)), jnp.asarray(gamma),
                         jnp.asarray([False]), 1.0,
                         jnp.asarray([1.0, 1.0]))
    lhs = float(b[: 2 * space.n_p2] @ w_vel.reshape(-1))
    w_at_p, _ = eval_velocity(space, w_vel, pts)
    rhs = float(jnp.sum(jnp.asarray(gamma) * w_at_p))
    assert np.isclose(lhs, rhs, rtol=1e-12)
