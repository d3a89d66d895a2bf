"""Matrix-free FGMRES saddle solver vs the dense direct path."""

import jax.numpy as jnp
import numpy as np

from ocean_jax.pipelines import stokes_gradcheck as sg
from ocean_jax.fem import assemble
from ocean_jax.solve import krylov


def test_fgmres_matches_dense_on_stokes():
    prob = sg.build(nx=8)
    f = sg.default_control(prob)
    w_direct = sg.solve_state(prob, f.quad)
    b = assemble.boundary_load(prob.space, prob.bq, f.quad)
    res = krylov.solve_operator_krylov(
        prob.op, b, prob.bc_vals, space=prob.space, nu=1.0,
        tol=1e-12, restart=150, max_restarts=20)
    assert bool(res.converged), float(res.residual_norm)
    err = float(jnp.abs(res.x - w_direct).max())
    assert err < 1e-8, err


def test_fgmres_on_spd_system():
    rng = np.random.default_rng(0)
    n = 120
    a = rng.standard_normal((n, n))
    a = a @ a.T + n * np.eye(n)
    b = rng.standard_normal(n)
    res = krylov.fgmres(lambda x: jnp.asarray(a) @ x, jnp.asarray(b),
                        restart=40, max_restarts=10, tol=1e-12)
    assert bool(res.converged)
    x_ref = np.linalg.solve(a, b)
    assert np.allclose(np.asarray(res.x), x_ref, atol=1e-8)


def test_explicit_inverse_host_progress_resume(tmp_path):
    """Chunk-level crash-resume of the host-staged explicit inverse: a
    build interrupted after some chunks (simulated by a partial progress
    file) completes to the same inverse as an uninterrupted build."""
    import numpy as np
    import jax.numpy as jnp
    from ocean_jax.ops.linalg import explicit_inverse_host

    rng = np.random.default_rng(0)
    n = 48
    a = jnp.asarray(rng.standard_normal((n, n)) + n * np.eye(n))

    full = np.asarray(explicit_inverse_host(a, chunk=8))

    # interrupted build: run once to create the progress file, then wipe
    # the column blocks PAST the recorded chunk count and resume
    p = str(tmp_path / "ainv.progress")
    _ = explicit_inverse_host(a, chunk=8, progress_path=p)
    st = dict(np.load(p))
    st["done"] = 2
    st["cols"][:, 16:] = np.nan          # anything after chunk 2 is junk
    with open(p, "wb") as fh:
        np.savez(fh, **st)
    resumed = np.asarray(explicit_inverse_host(a, chunk=8,
                                               progress_path=p))
    assert np.isfinite(resumed).all()
    np.testing.assert_allclose(resumed, full, rtol=0, atol=1e-6)
