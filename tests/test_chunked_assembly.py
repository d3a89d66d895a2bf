"""Cell-chunked assembly (assemble.map_cells) == all-cells vmap, bitwise.

The chunked path exists because the all-cells jacfwd assembly holds
per-quad intermediates like (nq, ncell, 12, 15, 2, 2) whose tiny trailing
dims TPU tiling pads 11–14x — 15.75 GB of HLO temps at Nx=192, the
round-3 hires OOM. Chunking must not change a single bit: the per-cell
math is identical, only the batching changes."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod
from ocean_jax.fem import assemble


@pytest.fixture
def prob():
    rng = np.random.default_rng(0)
    K = 3
    cfg = OCPConfig(unit_square_resolution=12, ud_experiment=f"{K}_buoys",
                    T=0.05, dt=0.005)
    seeds = 0.3 + 1.0 * rng.random((K, 2))
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    return sys_mod.build_problem(cfg, u_d=u_d, x0=seeds)


def _force_chunking(monkeypatch, chunk=100):
    # 12x12 mesh = 288 cells: chunk=100 exercises padding (288 -> 3 blocks
    # of 100 with 12 padded cells)
    monkeypatch.setattr(assemble, "CELL_CHUNK_THRESHOLD", 0)
    monkeypatch.setattr(assemble, "CELL_CHUNK", chunk)


def test_chunked_ops_bitwise(prob, monkeypatch):
    rng = np.random.default_rng(1)
    w = jnp.asarray(0.3 * rng.standard_normal(prob.space.ndof))
    ref_r = assemble.ns_residual(prob.space, prob.bq, w, None, prob.nu)
    ref_op = assemble.ns_operator(prob.space, prob.bq, w, prob.nu,
                                  prob.bc_dofs)
    ref_adj = assemble.adjoint_operator(prob.space, prob.bq, w,
                                        prob.bc_dofs)
    _force_chunking(monkeypatch)
    chk_r = assemble.ns_residual(prob.space, prob.bq, w, None, prob.nu)
    chk_op = assemble.ns_operator(prob.space, prob.bq, w, prob.nu,
                                  prob.bc_dofs)
    chk_adj = assemble.adjoint_operator(prob.space, prob.bq, w,
                                        prob.bc_dofs)
    assert float(jnp.abs(ref_r - chk_r).max()) == 0.0
    assert float(jnp.abs(ref_op.cell_mats - chk_op.cell_mats).max()) == 0.0
    assert float(jnp.abs(ref_adj.cell_mats - chk_adj.cell_mats).max()) == 0.0


def test_chunked_gd_step_bitwise(prob, monkeypatch):
    f = sys_mod.initial_control(prob, case=1)
    lr = jnp.asarray(1.0)
    a = sys_mod.gd_step(prob, f, lr, use_line_search=True)
    _force_chunking(monkeypatch)
    b = sys_mod.gd_step(prob, f, lr, use_line_search=True)
    assert float(a.J) == float(b.J)
    assert float(jnp.abs(a.f_new.quad - b.f_new.quad).max()) == 0.0
    assert float(a.lr) == float(b.lr)
