"""Orbax checkpoint backend (BACKLOG item 7).

An alternative to the ``.npz`` control checkpoints of ``io.checkpoint``
for multi-host / long-running deployments: Orbax gives atomic writes,
retention policies, and sharded-array support out of the box. The payload
and semantics match ``checkpoint.save_control`` (control quad/p2 values +
running LR + iteration — the reference's q checkpoint of
``OCP_dolfin.py:439-441`` extended with the LR/iteration resume state).

Orbax is optional at runtime: importing this module without orbax
installed raises ImportError only when a function is called.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..control import Control


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_control(path: str, ctrl: Control, lr: Optional[float] = None,
                 iteration: Optional[int] = None) -> None:
    """Write an Orbax checkpoint directory at ``path`` (atomic)."""
    payload = {"quad": np.asarray(ctrl.quad), "p2": np.asarray(ctrl.p2),
               "lr": np.asarray(np.nan if lr is None else float(lr)),
               "iteration": np.asarray(-1 if iteration is None
                                       else int(iteration))}
    _checkpointer().save(os.path.abspath(path), payload, force=True)


def load_control(path: str) -> Tuple[Control, Optional[float],
                                     Optional[int]]:
    data = _checkpointer().restore(os.path.abspath(path))
    lr = float(data["lr"])
    it = int(data["iteration"])
    return (Control(data["quad"], data["p2"]),
            None if np.isnan(lr) else lr,
            None if it < 0 else it)
