"""Timing utilities (SURVEY §5.1).

``block_until_ready`` is not reliable on the tunneled TPU platform used in
development; ``sync`` forces a scalar host transfer, which is authoritative
on every backend. ``Timer`` wraps the reference's ``time.time()`` spans
(``OCP_dolfin.py:313,374-375``).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def sync(tree) -> None:
    """Force completion of a pytree of device values."""
    jax.block_until_ready(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        float(jnp.asarray(leaves[0]).reshape(-1)[0])


class Timer:
    """Context manager: ``with Timer() as t: ...; t.elapsed``."""

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.start
        return False
