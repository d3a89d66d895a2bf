"""Control/field checkpointing (SURVEY §5.4).

Replaces the reference's three XDMF ``write_checkpoint``/``read_checkpoint``
mechanisms with ``.npz`` archives:

  1. per-iteration control checkpoint (``OCP_dolfin.py:439-441``):
     ``checkpoints/q.npz`` holds the LATEST control (the resume source) and
     ``checkpoints/q_history.npz`` the full per-iteration time series —
     matching the reference's ``append=True`` XDMF semantics,
  2. cross-run warm start (``:484-486`` → ``q_backup/q.npz``; ``load_q`` at
     ``:151-154`` loads another experiment's final control),
  3. final field checkpoints for reruns
     (``:583-588`` → ``paraview/checkpoint/up.npz``).

Unlike the reference (which checkpoints only the control), the checkpoint
also stores the running learning rate and iteration index, so a resumed run
continues the LR schedule instead of restarting it (the reference's
documented gap, SURVEY §5.4).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..control import Control
from ..fem.spaces import TaylorHoodSpace, BoundaryQuad
from .. import control as ctrl_mod


def save_control(path: str, ctrl: Control, lr: float = None,
                 iteration: int = None) -> None:
    data = {"quad": np.asarray(ctrl.quad), "p2": np.asarray(ctrl.p2)}
    if lr is not None:
        data["lr"] = np.asarray(lr)
    if iteration is not None:
        data["iteration"] = np.asarray(iteration)
    np.savez(path, **data)


def append_control_history(path: str, ctrl: Control, lr: float = None,
                           iteration: int = None) -> int:
    """Append one iteration's control to a growing ``q_history.npz`` time
    series (the reference appends every iteration's projected control to
    one XDMF series with ``append=True``, ``OCP_dolfin.py:439-441``).
    Returns the new history length."""
    quad = np.asarray(ctrl.quad)[None]
    p2 = np.asarray(ctrl.p2)[None]
    lr_v = np.asarray([np.nan if lr is None else float(lr)])
    it_v = np.asarray([-1 if iteration is None else int(iteration)])
    if os.path.exists(path):
        with np.load(path) as data:
            quad = np.concatenate([data["quad"], quad])
            p2 = np.concatenate([data["p2"], p2])
            lr_v = np.concatenate([data["lr"], lr_v])
            it_v = np.concatenate([data["iteration"], it_v])
    np.savez(path, quad=quad, p2=p2, lr=lr_v, iteration=it_v)
    return len(it_v)


def load_control_history(path: str):
    """Load the per-iteration control series → (quads, p2s, lrs, iters)."""
    with np.load(path) as data:
        return (np.asarray(data["quad"]), np.asarray(data["p2"]),
                np.asarray(data["lr"]), np.asarray(data["iteration"]))


def load_control(path: str, space: TaylorHoodSpace, bq: BoundaryQuad
                 ) -> Tuple[Control, Optional[float], Optional[int]]:
    """Load a control checkpoint. Also accepts a bare P2 field array or a
    dolfin q_backup HDF5 (cross-implementation warm start)."""
    if path.endswith((".h5", ".xdmf")):
        raise ValueError(
            "dolfin checkpoints need the mesh; use load_dolfin_control")
    with np.load(path) as data:
        ctrl = Control(np.asarray(data["quad"]), np.asarray(data["p2"]))
        lr = float(data["lr"]) if "lr" in data else None
        it = int(data["iteration"]) if "iteration" in data else None
    return ctrl, lr, it


def load_dolfin_control(path: str, mesh, space: TaylorHoodSpace,
                        bq: BoundaryQuad, name: str = "f") -> Control:
    """Warm-start from a legacy-dolfin ``q_backup/q.h5`` checkpoint
    (capability parity with ``load_q``, ``OCP_dolfin.py:151-154``)."""
    import jax.numpy as jnp
    from .dolfin_h5 import read_checkpoint_velocity
    q = read_checkpoint_velocity(path, mesh, space, name)
    return ctrl_mod.from_p2(space, bq, jnp.asarray(q))


def save_fields(path: str, w: np.ndarray, space: TaylorHoodSpace) -> None:
    """Final (u, p) checkpoint (``OCP_dolfin.py:583-588``)."""
    u = np.asarray(w[: 2 * space.n_p2]).reshape(space.n_p2, 2)
    p = np.asarray(w[2 * space.n_p2:])
    np.savez(path, u=u, p=p, w=np.asarray(w))
