"""Fully fused Pallas point-source kernel: the transpose of the eval kernel.

Replaces the reference's hot loop #3 — K×200×2 sequential
``dolfin.PointSource(...).apply(b)`` calls (``OCP_dolfin.py:353-366``) — at
the kernel level, fusing EVERYTHING the XLA point-source path pays per GD
iteration into one VMEM-resident pass over the trajectory points:

  * point location (closed-form, double-single f32 — the same arithmetic
    as the primal ODE kernel, ``ode/pallas_ode.py``), eliminating the f64
    ``locate_points`` pass (~0.16 s of the fused K=10⁴ iteration),
  * P2 patch-weight evaluation (3×3 half-grid stencil, ds arithmetic,
    shared ``_patch_weights_ds`` tables with the primal kernel),
  * the γ-weighted scatter-add itself, as exact Ozaki-sliced one-hot MXU
    contractions into a half-grid image accumulator that never leaves
    VMEM (the image is (2·nx+1)×(2·ny+1)×2 ≈ 33 KB at Nx=32, vs the
    ~0.32 s HBM-bound segment reduction of the sorted/ozaki XLA paths).

Exactness argument (same recipe as ``ops/psum_pallas.py``): each per-point
value v = W·γ/scale (|v| ≤ 1, ds pair) is decomposed into ``slices``
integer pieces c_k = round(v·2^(7+8k)) with |c_k| ≤ 2⁸ — exact in bf16.
The b-offset fold Σ_b rowhot_b·c_k keeps ≤ 1 nonzero per (row, point) so
values stay integers; the (Hy, chunk)×(chunk, Hxp) bf16 MXU contraction
with one-hot columns sums ≤ 2¹¹ addends of magnitude ≤ 2⁸ — below the
2²⁴ f32 mantissa, exact. Cross-chunk accumulation is an error-free TwoSum
carry on integer-valued partials. The only rounding left is the ds
representation of γ and W and the slicing tail beyond ``7+8·slices`` bits
(≈ 2⁻⁵⁵ relative at the default 6 slices) — measured ≤ 1e-12 absolute
against the f64 sorted reduction.

The transpose property (SURVEY §7.3 "PointSource transpose") is preserved
structurally: the patch weights are the SAME closed-form P2 basis the
primal/eval kernels use for interpolation, and the image→dof map is the
exact transpose of ``grideval.velocity_to_grid``.

Gating: both escape modes — reference semantics (whole-buoy mask) and the
consistent-adjoint mode (per-(buoy, time) ``active_t`` window); the caller
zeroes inactive γ lanes and passes effective positions, so the kernel
itself is mode-agnostic. Domain coverage matches the primal Pallas kernel:
uniform square/L-shape plus graded tensor meshes (in-kernel ds-exact
searchsorted over the shared ``_lines_planes`` table) and hole domains —
hole interiors need no in-kernel handling because every γ≠0 point lies in
an active cell (an escaped buoy's lanes are zeroed before the kernel and
its in-hole image contributions are dropped by the ``dof_to_node`` gather,
which only addresses existing dofs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import doublesingle as ds
from ..ode.grideval import GridEval
from ..ode.pallas_ode import (_patch_weights_ds, _make_graded_axis,
                              _lines_planes,
                              _register_mosaic_barrier_lowering)

_register_mosaic_barrier_lowering()

_CHUNK = 1024
_SLICES = 6


def _make_psrc_kernel(loc, Hy: int, Hxp: int, chunk: int, slices: int,
                      Lp: int = 0):
    """Kernel body with geometry constants baked in. Grid is 1-D over
    point chunks; the hi/lo image accumulators are revisited every step.
    ``Lp`` is the padded grid-line-table extent for graded tensor meshes
    (0 = uniform closed-form location), as in the primal/eval kernels."""
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
        it_refs = iter(refs)
        p_hi_ref, p_lo_ref, g_hi_ref, g_lo_ref = (
            next(it_refs) for _ in range(4))
        lines_ref = next(it_refs) if graded else None
        hi_ref, lo_ref = next(it_refs), next(it_refs)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            hi_ref[:] = jnp.zeros(hi_ref.shape, hi_ref.dtype)
            lo_ref[:] = jnp.zeros(lo_ref.shape, lo_ref.dtype)

        shape = (1, chunk)
        zf = jnp.zeros(shape, jnp.float32)

        def C(c):
            return (jnp.full_like(zf, c[0]), jnp.full_like(zf, c[1]))

        px = (p_hi_ref[0:1, :], p_lo_ref[0:1, :])
        py = (p_hi_ref[1:2, :], p_lo_ref[1:2, :])

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
            coords_x, coords_y = _make_graded_axis(lines_ref, Lp, chunk,
                                                   nx, ny)
            ix, s = coords_x(pcx)
            iy, t = coords_y(pcy)
        else:
            ix, s = axis_coords(pcx, x0c, hxc, nx)
            iy, t = axis_coords(pcy, y0c, hyc, ny)
        W, _ = _patch_weights_ds(s, t, diagonal)

        iota_y = jax.lax.broadcasted_iota(jnp.int32, (Hy, chunk), 0)
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (Hxp, chunk), 0)
        gy0, gx0 = 2 * iy, 2 * ix
        rowhot = [(iota_y == (gy0 + b)).astype(jnp.float32)
                  for b in range(3)]                       # 3 × (Hy, chunk)
        colhot = [(iota_x == (gx0 + a)).astype(jnp.bfloat16)
                  for a in range(3)]                       # 3 × (Hxp, chunk)

        for c in range(2):
            gam = (g_hi_ref[c:c + 1, :], g_lo_ref[c:c + 1, :])
            # integer pieces of W[b][a]·γ_c at scales 2^(7+8k)
            pieces = [[None] * 3 for _ in range(3)]
            for b in range(3):
                for a in range(3):
                    r = ds.mul(W[b][a], gam)
                    pk = []
                    for k in range(slices):
                        g = np.float32(2.0 ** (7 + 8 * k))
                        ginv = np.float32(2.0 ** -(7 + 8 * k))
                        ck = jnp.floor(r[0] * g + np.float32(0.5))
                        pk.append(ck)
                        if k + 1 < slices:
                            r = ds.sub(r, (ck * ginv, jnp.zeros_like(ck)))
                    pieces[b][a] = pk
            # fold the 3 row offsets (distinct rows per point → values stay
            # integers ≤ 2⁸), one MXU contraction per (col offset, slice)
            for a in range(3):
                for k in range(slices):
                    vm = (rowhot[0] * pieces[0][a][k]
                          + rowhot[1] * pieces[1][a][k]
                          + rowhot[2] * pieces[2][a][k]).astype(jnp.bfloat16)
                    part = jax.lax.dot_general(
                        vm, colhot[a],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (Hy, Hxp)
                    col = (c * slices + k) * Hxp
                    h0 = hi_ref[:, col:col + Hxp]
                    ssum = h0 + part
                    bb = ssum - h0
                    e = (h0 - (ssum - bb)) + (part - bb)
                    hi_ref[:, col:col + Hxp] = ssum
                    lo_ref[:, col:col + Hxp] = (
                        lo_ref[:, col:col + Hxp] + e)

    return kernel


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _run_psrc(grid: GridEval, points: jnp.ndarray, gamma: jnp.ndarray,
              slices: int = _SLICES, interpret: bool = False) -> jnp.ndarray:
    """points (M, 2) f64, gamma (M, 2) f64 (already masked/zeroed) →
    b_vel (n_p2, 2) f64: Σ_m γ_m · φ(x_m) scattered onto the P2 dofs."""
    loc = grid.locator
    Hy, Hx = grid.hg_shape
    Hxp = _round_up(Hx, 8)
    M = points.shape[0]
    Mpad = _round_up(max(M, 1), _CHUNK)

    maxabs = jnp.max(jnp.abs(gamma), axis=0)
    scale = jnp.exp2(jnp.ceil(jnp.log2(jnp.where(maxabs > 0, maxabs, 1.0))))
    r = gamma / scale                                      # |r| ≤ 1, f64

    pad_pt = jnp.asarray([loc.origin[0] + loc.spacing[0],
                          loc.origin[1] + loc.spacing[1]], points.dtype)
    pts = jnp.concatenate(
        [points, jnp.broadcast_to(pad_pt, (Mpad - M, 2))], axis=0)
    p_hi = pts.astype(jnp.float32).T                       # (2, Mpad)
    p_lo = (pts - p_hi.T.astype(jnp.float64)).astype(jnp.float32).T
    r = jnp.concatenate([r, jnp.zeros((Mpad - M, 2), r.dtype)], axis=0)
    g_hi = r.astype(jnp.float32).T
    g_lo = (r - g_hi.T.astype(jnp.float64)).astype(jnp.float32).T

    nx, ny = loc.grid_shape
    graded = not loc.uniform
    Lp = _round_up(max(nx, ny) + 1, 8) if graded else 0
    kernel = _make_psrc_kernel(loc, Hy, Hxp, _CHUNK, slices, Lp)
    zero = np.int32(0)
    pt_spec = pl.BlockSpec((2, _CHUNK), lambda i: (zero, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((Hy, 2 * slices * Hxp), lambda i: (zero, zero),
                            memory_space=pltpu.VMEM)
    extra_inputs, extra_specs = [], []
    if graded:
        extra_inputs.append(_lines_planes(loc, Lp))
        extra_specs.append(pl.BlockSpec((Lp, 128), lambda i: (zero, zero),
                                        memory_space=pltpu.VMEM))
    hi, lo = pl.pallas_call(
        kernel,
        grid=(Mpad // _CHUNK,),
        in_specs=[pt_spec, pt_spec, pt_spec, pt_spec] + extra_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((Hy, 2 * slices * Hxp),
                                        jnp.float32)] * 2,
        interpret=interpret,
    )(p_hi, p_lo, g_hi, g_lo, *extra_inputs)
    # interpret-mode guard: stop XLA:CPU from re-associating the TwoSum
    hi, lo = jax.lax.optimization_barrier((hi, lo))

    acc = (hi.astype(jnp.float64) + lo.astype(jnp.float64))
    acc = acc.reshape(Hy, 2, slices, Hxp)[:, :, :, :Hx]    # (Hy, 2, S, Hx)
    w = jnp.asarray([2.0 ** -(7 + 8 * k) for k in range(slices)])
    img = jnp.einsum("yckx,k->ycx", acc, w) * scale[None, :, None]
    img = img.transpose(0, 2, 1).reshape(Hy * Hx, 2)       # node-major
    return img[grid.dof_to_node]                           # (n_p2, 2)


# Compiled TPU path jits once per shape; interpret mode stays EAGER (the
# XLA:CPU compile of the lowered interpreter body is pathologically slow,
# same note as ode/pallas_eval.py:190-194).
_run_psrc_jit = jax.jit(_run_psrc, static_argnames=("slices", "interpret"))


def point_source_image_pallas(grid: GridEval, points: jnp.ndarray,
                              gamma: jnp.ndarray,
                              interpret: bool = None) -> jnp.ndarray:
    """b_vel (n_p2, 2) = Σ_m γ_m φ(x_m) via the fused kernel.

    ``gamma`` must already carry the reference's masking (escaped buoys
    zeroed, ``OCP_dolfin.py:354-355``); locations are clamped evaluations
    exactly as ``mesh.locate.locate_points``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    runner = _run_psrc if interpret else _run_psrc_jit
    return runner(grid, points.reshape(-1, 2), gamma.reshape(-1, 2),
                  interpret=bool(interpret))
