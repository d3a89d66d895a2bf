"""Fused Pallas kernel for batched P1-tensor (∇u) point evaluation.

The adjoint buoy ODE's cost is one batched evaluation of the projected
gradient field at ALL K·nt trajectory points (``OCP_dolfin.py:243-245``;
2·10⁶ points at the limits configuration) — measured ~1.2 s of the
2.0 s fused GD iteration as an XLA gather chain. This kernel evaluates
the P1 tensor field from its vertex-grid image with the same design as
the primal-ODE kernel (``ode/pallas_ode.py``): closed-form point
location, exact one-hot MXU row selection of the 2×2 vertex patch, and
double-single f32 arithmetic for the local coordinates and basis
weights so results match the f64 XLA path to ~1e-12 (the gradient-table
parity bar).

No time loop here — the adjoint μ recursion itself is linear and stays
in XLA as the existing parallel prefix (``ode/adjoint.py``); only the
field evaluation moves into the kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import doublesingle as ds
from .grideval import GridEval
from .pallas_ode import (_register_mosaic_barrier_lowering, _lines_planes,
                         _make_graded_axis)

_register_mosaic_barrier_lowering()

_BLOCK = 256


def _p1_patch_weights_ds(s, t, diagonal):
    """ds version of ``grideval.p1_patch_weights``: W[b][a] (b = y-row of
    the 2×2 vertex patch, a = x-column), branchless triangle select."""
    zero = ds.from_f32(jnp.zeros_like(s[0]))
    one = np.float32(1.0)
    if diagonal == "right":
        upper = ds.gt(t, s)
        Wl = [[ds.add_f32(ds.neg(s), one), ds.sub(s, t)],
              [zero, t]]
        Wu = [[ds.add_f32(ds.neg(t), one), zero],
              [ds.sub(t, s), s]]
    elif diagonal == "left":
        st = ds.add(s, t)
        upper = ds.gt(st, ds.from_f32(jnp.full_like(s[0], one)))
        Wl = [[ds.add_f32(ds.neg(st), one), s],
              [t, zero]]
        Wu = [[zero, ds.add_f32(ds.neg(t), one)],
              [ds.add_f32(ds.neg(s), one), ds.add_f32(st, -one)]]
    else:                                        # pragma: no cover
        raise ValueError(f"unsupported diagonal {diagonal!r}")
    return [[ds.where(upper, Wu[b][a], Wl[b][a]) for a in range(2)]
            for b in range(2)], upper


def _make_eval_kernel(loc, Gy: int, Gxp: int, ncomp: int, block: int,
                      Lp: int = 0):
    """Kernel body with geometry constants baked in. ``planes`` holds
    ``ncomp`` field components as exact hi/lo f32 pairs, x-major:
    (2·ncomp·Gxp, Gy). ``Lp`` is the padded grid-line-table extent for
    graded tensor meshes (0 = uniform closed-form location). Hole
    domains need no in-kernel handling: evaluation is clamped and the
    caller masks with the f64 ``in_domain`` predicate — out-of-domain
    lanes read the same (zero-filled) image nodes as the XLA grid path,
    so parity holds even on masked lanes."""
    nx, ny = loc.grid_shape
    graded = not loc.uniform
    x0c, y0c = ds.const(loc.origin[0]), ds.const(loc.origin[1])
    hxc, hyc = ds.const(loc.spacing[0]), ds.const(loc.spacing[1])
    xmin, ymin, xmax, ymax = loc.extent
    xminc, yminc = ds.const(xmin), ds.const(ymin)
    xmaxc, ymaxc = ds.const(xmax), ds.const(ymax)
    lshape = loc.domain == "lshape"
    if lshape:
        cx_clamp = ds.const(loc.lshape_corner[0])
        cy_clamp = ds.const(loc.lshape_corner[1])
        cy_proj = ds.const(loc.lshape_corner[1] - 0.5 * loc.spacing[1])
    diagonal = loc.diagonal

    def kernel(*refs):
        it = iter(refs)
        ph_ref, plo_ref, planes_ref = next(it), next(it), next(it)
        lines_ref = next(it) if graded else None
        oh_ref, ol_ref = next(it), next(it)
        shape = (1, block)
        zf = jnp.zeros(shape, jnp.float32)

        def C(c):
            return (jnp.full_like(zf, c[0]), jnp.full_like(zf, c[1]))

        iota_y = jax.lax.broadcasted_iota(jnp.int32, (Gy, block), 0)
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (Gxp, block), 0)

        px = (ph_ref[0:1, :], plo_ref[0:1, :])
        py = (ph_ref[1:2, :], plo_ref[1:2, :])

        # clamp to extent (+ L-shape notch projection), as locate_points
        pcx = ds.where(ds.gt(C(xminc), px), C(xminc), px)
        pcx = ds.where(ds.gt(pcx, C(xmaxc)), C(xmaxc), pcx)
        pcy = ds.where(ds.gt(C(yminc), py), C(yminc), py)
        pcy = ds.where(ds.gt(pcy, C(ymaxc)), C(ymaxc), pcy)
        if lshape:
            in_block = ds.gt(C(cx_clamp), pcx) & ds.gt(pcy, C(cy_clamp))
            pcy = ds.where(in_block, C(cy_proj), pcy)

        def axis_coords(p, origin_c, spacing_c, n):
            fx = ds.div(ds.sub(p, C(origin_c)), C(spacing_c))
            ixf, frac = ds.floor(fx)
            d = jnp.clip(ixf, np.float32(0.0), np.float32(n - 1))
            s = ds.add_f32(frac, ixf - d)
            return d.astype(jnp.int32), s

        if graded:
            coords_x, coords_y = _make_graded_axis(lines_ref, Lp, block,
                                                   nx, ny)
            ix, s = coords_x(pcx)
            iy, t = coords_y(pcy)
        else:
            ix, s = axis_coords(pcx, x0c, hxc, nx)
            iy, t = axis_coords(pcy, y0c, hyc, ny)
        W, _ = _p1_patch_weights_ds(s, t, diagonal)

        onehot = jnp.concatenate(
            [(iota_y == (iy + r)).astype(jnp.float32) for r in range(2)],
            axis=1)                                    # (Gy, 2·block)
        R = jax.lax.dot_general(
            planes_ref[:], onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)        # (2·ncomp·Gxp, 2·block)
        colmask = [(iota_x == (ix + c)).astype(jnp.float32)
                   for c in range(2)]                  # 2 × (Gxp, block)

        def patch(p, r, c):
            sub = R[p * Gxp:(p + 1) * Gxp, r * block:(r + 1) * block]
            return jnp.sum(sub * colmask[c], axis=0, keepdims=True)

        for comp in range(ncomp):
            acc = ds.from_f32(zf)
            for b in range(2):
                for a in range(2):
                    val = (patch(comp, b, a), patch(ncomp + comp, b, a))
                    acc = ds.add(acc, ds.mul(W[b][a], val))
            oh_ref[comp:comp + 1, :] = acc[0]
            ol_ref[comp:comp + 1, :] = acc[1]

    return kernel


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _run_eval(grid: GridEval, field_img: jnp.ndarray, points: jnp.ndarray,
              ncomp: int, interpret: bool = False) -> jnp.ndarray:
    """field_img: (Gy·Gx, ncomp) f64 vertex-grid image; points (Np, 2) f64
    → (Np, ncomp) f64 (clamped evaluation; mask with ``in_domain``)."""
    loc = grid.locator
    Gy, Gx = grid.vg_shape
    Gxp = _round_up(Gx, 8)
    Np = points.shape[0]
    Npad = _round_up(max(Np, 1), _BLOCK)

    img = field_img.reshape(Gy, Gx, ncomp)
    hi = img.astype(jnp.float32)
    lo = (img - hi.astype(jnp.float64)).astype(jnp.float32)
    planes = jnp.concatenate([hi.transpose(2, 1, 0),
                              lo.transpose(2, 1, 0)], axis=0)
    planes = jnp.pad(planes, ((0, 0), (0, Gxp - Gx), (0, 0)))
    planes = planes.reshape(2 * ncomp * Gxp, Gy)

    pad_pt = jnp.asarray([loc.origin[0] + loc.spacing[0],
                          loc.origin[1] + loc.spacing[1]], points.dtype)
    pts = jnp.concatenate(
        [points, jnp.broadcast_to(pad_pt, (Npad - Np, 2))], axis=0)
    p_hi = pts.astype(jnp.float32).T                     # (2, Npad)
    p_lo = (pts - p_hi.T.astype(jnp.float64)).astype(jnp.float32).T

    nx, ny = loc.grid_shape
    graded = not loc.uniform
    Lp = _round_up(max(nx, ny) + 1, 8) if graded else 0
    kernel = _make_eval_kernel(loc, Gy, Gxp, ncomp, _BLOCK, Lp)
    zero = np.int32(0)
    pt_spec = pl.BlockSpec((2, _BLOCK), lambda i: (zero, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ncomp, _BLOCK), lambda i: (zero, i),
                            memory_space=pltpu.VMEM)
    extra_inputs, extra_specs = [], []
    if graded:
        extra_inputs.append(_lines_planes(loc, Lp))
        extra_specs.append(pl.BlockSpec((Lp, 128), lambda i: (zero, zero),
                                        memory_space=pltpu.VMEM))
    oh, ol = pl.pallas_call(
        kernel,
        grid=(Npad // _BLOCK,),
        in_specs=[pt_spec, pt_spec,
                  pl.BlockSpec((2 * ncomp * Gxp, Gy),
                               lambda i: (zero, zero),
                               memory_space=pltpu.VMEM)] + extra_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((ncomp, Npad), jnp.float32)] * 2,
        interpret=interpret,
    )(p_hi, p_lo, planes, *extra_inputs)
    oh, ol = jax.lax.optimization_barrier((oh, ol))      # interpret-mode EFT guard
    return (oh.astype(jnp.float64) + ol.astype(jnp.float64)).T[:Np]


# Compiled TPU path: jit once per shape. Interpret mode stays EAGER —
# XLA:CPU's compile of the lowered interpreter body is pathologically
# slow (tens of minutes) for this kernel, while eager interpretation of
# a few point blocks takes seconds. Inside an enclosing jit the eager
# call is traced anyway, so semantics are identical.
_run_eval_jit = jax.jit(_run_eval, static_argnames=("ncomp", "interpret"))


def eval_p1_tensor_pallas(grid: GridEval, g_grid: jnp.ndarray,
                          points: jnp.ndarray,
                          interpret: bool = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``grideval.eval_p1_tensor_grid`` (P1 projected ∇u from
    the vertex-grid image) backed by the fused kernel.

    g_grid: (Gy·Gx, 2, 2) from :func:`grideval.grad_to_grid`;
    points (..., 2). Returns (values (..., 2, 2), inside (...,)).
    """
    from ..mesh.locate import in_domain
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    loc = grid.locator
    shape = points.shape[:-1]
    pts = points.reshape(-1, 2)
    runner = _run_eval if interpret else _run_eval_jit
    vals = runner(grid, g_grid.reshape(g_grid.shape[0], 4), pts,
                  ncomp=4, interpret=bool(interpret))
    inside = in_domain(loc, points)
    return vals.reshape(*shape, 2, 2), inside
