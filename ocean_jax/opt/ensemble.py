"""Ensemble-of-experiments parallelism (SURVEY §2.3 item 4).

A capability the serial reference cannot express: vmap whole
gradient-descent runs over an ensemble axis — the four initial-control
cases of ``initial_control_test.py:30-42``, or a learning-rate grid like
the LS-vs-fixed-LR study of ``plotting/plotting.py:11`` — and run them as
ONE XLA program (scan over iterations of a vmapped gd_step).

Per-member early exits (conv_crit / buoy escape) cannot break a fused
ensemble; instead each member carries a ``stopped`` flag that freezes its
state once its exit condition fires, preserving the reference's exit
semantics member-wise.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import system as sys_mod
from ..control import Control


class EnsembleResult(NamedTuple):
    j_history: jnp.ndarray        # (num_steps, C)
    lr_history: jnp.ndarray       # (num_steps, C)
    escaped_history: jnp.ndarray  # (num_steps, C)
    stopped_at: jnp.ndarray       # (C,) iteration of first exit (or num_steps)
    f_final: Control              # stacked (C, ...) controls


@partial(jax.jit, static_argnames=("num_steps", "use_line_search", "tau",
                                   "c_armijo", "lr_min", "max_ls_iters",
                                   "conv_crit", "escape_threshold"))
def run_ensemble(prob: "sys_mod.OCPProblem", f0: Control,
                 lr0: jnp.ndarray, num_steps: int,
                 use_line_search: bool = False, tau: float = 0.5,
                 c_armijo: float = 1e-4, lr_min: float = 1e-6,
                 max_ls_iters: int = 40, conv_crit: float = 1e-3,
                 escape_threshold: float = 1e30) -> EnsembleResult:
    """f0: Control with a leading ensemble axis C on quad/p2;
    lr0: (C,) initial learning rates."""
    C = lr0.shape[0]

    def member_step(f_quad, f_p2, lr):
        res = sys_mod.gd_step(prob, Control(f_quad, f_p2), lr,
                              use_line_search=use_line_search, tau=tau,
                              c_armijo=c_armijo, lr_min=lr_min,
                              max_ls_iters=max_ls_iters)
        escaped = jnp.sum(res.fwd.mask)
        return (res.f_new.quad, res.f_new.p2, res.lr, res.J, escaped,
                res.diverged)

    vstep = jax.vmap(member_step)

    def scan_step(carry, i):
        fq, fp2, lr, j_prev, stopped, stop_at = carry
        nfq, nfp2, nlr, j, escaped, div = vstep(fq, fp2, lr)
        # freeze stopped members (reference exit semantics, member-wise);
        # a member whose fast-path Newton diverged (NaN) is frozen at its
        # PRE-step state so the NaN update never enters the carry
        frozen = stopped | div
        fq = jnp.where(frozen[:, None, None, None], fq, nfq)
        fp2 = jnp.where(frozen[:, None, None], fp2, nfp2)
        lr = jnp.where(frozen, lr, nlr)
        j_rec = jnp.where(frozen, j_prev, j)
        conv = (i > 5) & (jnp.abs(j_rec - j_prev) < conv_crit)
        escape = escaped > escape_threshold
        newly = (~stopped) & (conv | escape | div)
        stop_at = jnp.where(newly, i, stop_at)
        stopped = stopped | conv | escape | div
        carry = (fq, fp2, lr, j_rec, stopped, stop_at)
        return carry, (j_rec, lr, escaped)

    init = (f0.quad, f0.p2, lr0, jnp.full(C, jnp.inf),
            jnp.zeros(C, bool), jnp.full(C, num_steps))
    (fq, fp2, lr, _, _, stop_at), (js, lrs, esc) = jax.lax.scan(
        scan_step, init, jnp.arange(num_steps))
    return EnsembleResult(js, lrs, esc, stop_at, Control(fq, fp2))


def stack_controls(controls) -> Control:
    """[Control, ...] → Control with leading ensemble axis."""
    return Control(jnp.stack([c.quad for c in controls]),
                   jnp.stack([c.p2 for c in controls]))
