"""Post-processing toolbox + IO round-trips."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from ocean_jax import postprocess
from ocean_jax.io import artifacts, checkpoint, xdmf
from ocean_jax.mesh import unit_square_mesh
from ocean_jax.control import Control


def test_timings_roundtrip():
    d = tempfile.mkdtemp()
    path = os.path.join(d, "timings.txt")
    artifacts.write_timings(path, [1.5, 2.5], [0.5, 0.25], [3, 1])
    agg = postprocess.aggregate_timings(path)
    assert agg["iterations"] == 2
    assert np.isclose(agg["avg_outer_time"], 2.0)
    assert np.isclose(agg["avg_inner_time"], 0.375)
    assert np.isclose(agg["total_time"], 4.75)
    assert agg["total_inner_iterations"] == 4


def test_cost_overlay_and_histogram():
    d = tempfile.mkdtemp()
    j1 = os.path.join(d, "a.npy")
    j2 = os.path.join(d, "b.npy")
    np.save(j1, np.geomspace(1, 0.01, 20))
    np.save(j2, np.geomspace(2, 0.05, 20))
    out = os.path.join(d, "overlay.png")
    postprocess.cost_curve_overlay({"LS": j1, "LR=2": j2}, out)
    assert os.path.getsize(out) > 1000
    hist = os.path.join(d, "hist.png")
    postprocess.timing_histogram(hist, iteration_times=[0.01, 0.1, 0.5, 4.6])
    assert os.path.getsize(hist) > 1000


def test_control_checkpoint_roundtrip():
    d = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    ctrl = Control(jnp.asarray(rng.random((6, 4, 2))),
                   jnp.asarray(rng.random((30, 2))))
    path = os.path.join(d, "q.npz")
    checkpoint.save_control(path, ctrl, lr=0.625, iteration=7)
    c2, lr, it = checkpoint.load_control(path, None, None)
    assert np.allclose(np.asarray(ctrl.quad), c2.quad)
    assert np.allclose(np.asarray(ctrl.p2), c2.p2)
    assert lr == 0.625 and it == 7


def test_xdmf_writer():
    d = tempfile.mkdtemp()
    mesh = unit_square_mesh(4)
    nv = mesh.num_vertices
    path = os.path.join(d, "u.xdmf")
    xdmf.write_xdmf(path, mesh,
                    vector_fields={"u": np.ones((nv, 2))},
                    scalar_fields={"p": np.zeros(nv)})
    text = open(path).read()
    assert 'TopologyType="Triangle"' in text
    assert f'NumberOfElements="{mesh.num_cells}"' in text
    assert 'AttributeType="Vector"' in text
    assert 'AttributeType="Scalar"' in text
    # well-formed XML
    import xml.etree.ElementTree as ET
    ET.parse(path)


def test_replot_field():
    d = tempfile.mkdtemp()
    # ours
    from ocean_jax.mesh import rectangle_mesh
    from ocean_jax.fem import make_space
    mesh = rectangle_mesh((0.0, 0.0), (2.0, 2.0), 8, 8)
    space = make_space(mesh)
    w = np.zeros(space.ndof)
    ck = os.path.join(d, "up.npz")
    checkpoint.save_fields(ck, jnp.asarray(w), space)
    out = os.path.join(d, "re.png")
    postprocess.replot_field(ck, out, nx=8)
    assert os.path.getsize(out) > 1000
