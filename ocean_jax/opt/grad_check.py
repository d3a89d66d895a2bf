"""FD-vs-adjoint gradient verification tables.

Reimplements ``grad_test`` (``OCP_dolfin.py:268-295``): at iteration 0,
re-solve the full forward pipeline at f ± h·df for h = 10⁻¹ … 10⁻⁸ and
tabulate one-sided and centered FD approximations against the adjoint
reduced gradient, writing ``grad_J_error_{i}.txt`` and
``grad_J_error_centered_{i}.txt``.

Probe semantics: the reference threads the enclosing iteration's buoy_mask
through the perturbed solves, but its primal ODE ignores the incoming mask
values (every buoy is re-integrated, ``OCP_dolfin.py:201-230``), so pure
fresh forward solves compute identical probe costs — see ``_j_probe``.
"""

from __future__ import annotations

from typing import Optional

from .. import system as sys_mod
from ..control import Control
from ..io import artifacts


def _j_probe(prob, f_quad):
    """Forward solve + cost for one FD probe.

    The reference passes the outer iteration's buoy_mask into
    ``solve_primal_ode`` (``OCP_dolfin.py:275``) but its primal ODE never
    READS the incoming mask values — every buoy is re-integrated from its
    seed regardless (``:201-230``) — so a fresh forward solve here computes
    the identical probe cost. The one reference behavior deliberately NOT
    reproduced is the aliasing side effect: a buoy that escapes only inside
    a probe mutates the caller's buoy_mask in place, polluting the outer
    iteration's line search; our probes are pure (README "Deliberate
    deviations" #1)."""
    forward_fn, _ = sys_mod.stage_fns(prob)
    fwd = forward_fn(prob, f_quad)
    return float(sys_mod.cost(prob, fwd.u_values, f_quad))


def grad_test(prob, f: Control, df: Control, j0: float, gradj: float,
              iteration: int, out_dir: Optional[str] = None,
              ks=range(1, 9)):
    """Returns (one_sided_rows, centered_rows); optionally writes the two
    table files in the reference's format."""
    one_rows, cen_rows = [], []
    for k in ks:
        h = 10.0 ** (-k)
        jp = _j_probe(prob, f.quad + h * df.quad)
        ga = (jp - j0) / h
        one_rows.append((ga, abs(ga - gradj), h))
    for k in ks:
        h = 10.0 ** (-k)
        jp = _j_probe(prob, f.quad + h * df.quad)
        jm = _j_probe(prob, f.quad - h * df.quad)
        gc = (jp - jm) / (2 * h)
        cen_rows.append((gc, abs(gradj - gc), h))
    if out_dir is not None:
        import os
        artifacts.write_grad_table(
            os.path.join(out_dir, f"grad_J_error_{iteration}.txt"),
            gradj, one_rows)
        artifacts.write_grad_table(
            os.path.join(out_dir, f"grad_J_error_centered_{iteration}.txt"),
            gradj, cen_rows)
    return one_rows, cen_rows
