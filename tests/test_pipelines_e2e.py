"""End-to-end pipeline smoke tests (small configs, artifact checks)."""

import os
import tempfile

import numpy as np
import pytest

from ocean_jax.config import OCPConfig


@pytest.mark.slow
def test_lshape_ocp_descends():
    """The L-shape experiment (OCP_dolfin.py L_shape=True branch):
    analytic 3-buoy measurements, Γ₁ = {x=0} ∪ {y=2}, Armijo on."""
    from ocean_jax.pipelines import ocp
    d = tempfile.mkdtemp()
    cfg = OCPConfig(L_shape=True, L_shape_resolution=12,
                    ud_experiment="3_buoys", num_steps=3,
                    out_dir=d + "/", use_line_search=True, LR=5.0)
    res, prob = ocp.run(cfg, verbose=False)
    assert prob.K == 3
    j = res.j_array
    assert len(j) == 3 and j[2] < j[0]
    assert bool(res.last_fwd.newton.converged)
    assert not bool(res.last_fwd.mask.any())
    assert os.path.exists(d + "/variables.txt")
    assert "L-shape" in open(d + "/variables.txt").read()


@pytest.mark.slow
def test_ocp_checkpoint_resume():
    """checkpoints=True resumes from checkpoints/q.npz
    (OCP_dolfin.py:48,157-160), continuing from the saved control."""
    from ocean_jax.pipelines import ocp
    d = tempfile.mkdtemp()
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment="2_buoys",
                    num_steps=2, out_dir=d + "/", use_line_search=False,
                    LR=1.0)
    res1, prob = ocp.run(cfg, verbose=False)
    ck = np.load(d + "/checkpoints/q.npz")
    assert "quad" in ck and int(ck["iteration"]) == 1

    # resume: run 2 more steps from the checkpoint
    import dataclasses
    cfg2 = dataclasses.replace(cfg, checkpoints=True)
    res2, _ = ocp.run(cfg2, verbose=False)
    # the resumed run starts from the final control of run 1, so its
    # first cost is below run 1's last recorded cost region
    assert res2.j_array[0] < res1.j_array[0]


def test_control_history_appended():
    """checkpoints/q_history.npz grows by one entry per GD iteration
    (the reference's append=True XDMF series, OCP_dolfin.py:439-441)."""
    from ocean_jax.pipelines import ocp
    from ocean_jax.io import checkpoint
    d = tempfile.mkdtemp()
    cfg = OCPConfig(unit_square_resolution=8, ud_experiment="2_buoys",
                    num_steps=3, out_dir=d + "/", use_line_search=False,
                    LR=1.0)
    res, prob = ocp.run(cfg, verbose=False)
    quads, p2s, lrs, iters = checkpoint.load_control_history(
        d + "/checkpoints/q_history.npz")
    assert len(iters) == res.iterations_run == 3
    assert list(iters) == [0, 1, 2]
    latest = np.load(d + "/checkpoints/q.npz")
    assert np.array_equal(quads[-1], latest["quad"])
    assert np.array_equal(p2s[-1], latest["p2"])


def test_orbax_checkpoint_roundtrip():
    """Orbax backend stores/restores the same payload as io.checkpoint."""
    import jax.numpy as jnp
    from ocean_jax.control import Control
    from ocean_jax.io import orbax_ckpt
    c = Control(jnp.arange(24.0).reshape(2, 6, 2), jnp.ones((5, 2)))
    d = tempfile.mkdtemp() + "/ck"
    orbax_ckpt.save_control(d, c, lr=2.5, iteration=7)
    c2, lr, it = orbax_ckpt.load_control(d)
    assert np.allclose(np.asarray(c.quad), np.asarray(c2.quad))
    assert np.allclose(np.asarray(c.p2), np.asarray(c2.p2))
    assert lr == 2.5 and it == 7


def test_variables_txt_format():
    from ocean_jax.io import artifacts
    d = tempfile.mkdtemp()
    p = os.path.join(d, "variables.txt")
    artifacts.write_variables(p, 32, "custom_ud", 0.0, 1, 0.005, 1, 6,
                              5.0, 5.0, 1e-6, 1e-3, 50)
    text = open(p).read()
    # the exact keys the reference writes (OCP_dolfin.py:495-507)
    for key in ("mesh resolution:", "ud type:", "t0:", "T:", "dt:",
                "viscosity:", "buoy count:", "LR:", "LR_MAX:", "LR_MIN:",
                "conv. crit.:", "gradient descent steps:"):
        assert key in text, key
