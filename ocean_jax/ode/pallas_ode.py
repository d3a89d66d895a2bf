"""Fused primal-ODE Pallas TPU kernel: all nt−1 Euler steps in ONE kernel.

The reference's hot loop #1 (``OCP_dolfin.py:201-230``) costs K×200
Python→C++ crossings; the XLA scan backend (``ode/primal.py``) already
fuses it into one program but still dispatches per-step gather/compute ops
from an XLA while-loop. This kernel removes the remaining per-step
overhead: velocity field resident in VMEM, 200 time steps inside one
``fori_loop``, point location as closed-form half-grid arithmetic
(``ode/grideval.py``), and the 3×3 patch value gather as an **exact
one-hot MXU row-selection** (Mosaic has no per-lane vector gather; a
one-hot f32 matmul selects rows exactly — every output element is
1.0·x + Σ 0.0·y).

Precision: Pallas has no f64. Positions, local coordinates, basis weights
and interpolated velocities are computed in **double-single** f32 pairs
(``ops/doublesingle.py``, ~2⁻⁴⁸ relative) so trajectories match the f64
XLA backend to ~1e-12 — inside the 1e-9 golden-parity bar (VERDICT r1
item 4). The velocity field enters as exact hi/lo f32 planes.

Escape masking reproduces ``ode/primal.py`` exactly (same freeze/record
rules); the final-step evaluation and escaped-buoy overwrite
(``OCP_dolfin.py:213-229``) run outside the kernel in f64 XLA.

Supported domains: ALL structured domains ("right" or "left" diagonal) —
square/rectangle, L-shape, and the gen-1 pipe meshes
(``old_dolfinx_files/mesh_init.py:95-194``) in every variant:

* **locally-graded tensor grids** (``mesh/structured.py::graded_lines``):
  the closed-form index arithmetic is replaced by an in-kernel
  searchsorted — grid lines enter as an exact hi/lo f32 table, the
  owning interval is a comparison count over the (few hundred) lines,
  and the interval endpoints come back through an exact one-hot
  selection (0/1 × f32 products, error-free);
* **obstacle (hole) domains**: the escape predicate reproduces
  ``mesh/locate.py::in_domain`` — the exact-circle test in double-single
  arithmetic plus the active-square condition, read from a 0/1 mask
  plane via the same one-hot MXU row selection as the velocity patch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fem.spaces import TaylorHoodSpace
from ..mesh.locate import in_domain
from ..ops import doublesingle as ds
from .grideval import GridEval, velocity_to_grid, eval_velocity_grid
from .primal import PrimalODEResult

_EPS = 1e-12      # boundary-inclusive slack, mesh/locate.py:_EPS

# buoy block per grid program (lane axis of all per-buoy tensors)
_BLOCK = 256


def _register_mosaic_barrier_lowering():
    """Mosaic has no lowering for ``optimization_barrier`` (the EFT guard
    used by ``ops/doublesingle.py``); register an identity rule so the
    kernel compiles. Inside Mosaic the barrier is unnecessary: the Mosaic
    → TPU compilation is IEEE-literal (no FMA contraction, no algebraic
    re-association of the XLA-simplifier kind), verified on hardware by
    ``tests/test_ode_backends.py``'s f64-parity checks and the in-kernel
    EFT probe (two_prod/two_sum exact vs host f64)."""
    try:
        from jax._src.lax.lax import optimization_barrier_p as _ob
        from jax._src.pallas.mosaic import lowering as _ml
    except ImportError:                              # pragma: no cover
        return
    try:
        registered = any(_ob in rules
                         for rules in _ml.lowering_rules.values())
        if not registered:
            @_ml.register_lowering_rule(_ob)
            def _barrier_identity(ctx, *args):       # noqa: ANN001
                return list(args)
    except Exception:                                # pragma: no cover
        pass


_register_mosaic_barrier_lowering()


def _vert(l):
    """Vertex P2 basis value λ(2λ−1) in ds."""
    return ds.mul(l, ds.add_f32(ds.scale_exact(l, np.float32(2.0)),
                                np.float32(-1.0)))


def _edge(li, lj):
    """Edge-midpoint P2 basis value 4λiλj in ds."""
    return ds.scale_exact(ds.mul(li, lj), np.float32(4.0))


def _patch_weights_ds(s, t, diagonal):
    """ds version of ``grideval.p2_patch_weights``: W[b][a] as a 3×3
    python list of ds pairs (branchless triangle select per entry)."""
    zero = ds.from_f32(jnp.zeros_like(s[0]))
    one = np.float32(1.0)

    def neg1(x):
        return ds.neg(x)

    if diagonal == "right":
        upper = ds.gt(t, s)
        # lower (t <= s): λ = (1−s, s−t, t) on (0,0),(2,0),(2,2)
        lA, lB, lC = ds.add_f32(neg1(s), one), ds.sub(s, t), t
        Wl = [[_vert(lA), _edge(lA, lB), _vert(lB)],
              [zero, _edge(lA, lC), _edge(lB, lC)],
              [zero, zero, _vert(lC)]]
        # upper (t > s): λ = (1−t, s, t−s) on (0,0),(2,2),(0,2)
        lA, lC, lD = ds.add_f32(neg1(t), one), s, ds.sub(t, s)
        Wu = [[_vert(lA), zero, zero],
              [_edge(lA, lD), _edge(lA, lC), zero],
              [_vert(lD), _edge(lC, lD), _vert(lC)]]
    elif diagonal == "left":
        st = ds.add(s, t)
        upper = ds.gt(st, ds.from_f32(jnp.full_like(s[0], one)))
        lA, lB, lD = ds.add_f32(ds.neg(st), one), s, t
        Wl = [[_vert(lA), _edge(lA, lB), _vert(lB)],
              [_edge(lA, lD), _edge(lB, lD), zero],
              [_vert(lD), zero, zero]]
        lB2, lC, lD2 = (ds.add_f32(neg1(t), one), ds.add_f32(st, -one),
                        ds.add_f32(neg1(s), one))
        Wu = [[zero, zero, _vert(lB2)],
              [zero, _edge(lB2, lD2), _edge(lB2, lC)],
              [_vert(lD2), _edge(lC, lD2), _vert(lC)]]
    else:                                        # pragma: no cover
        raise ValueError(f"unsupported diagonal {diagonal!r}")
    return [[ds.where(upper, Wu[b][a], Wl[b][a]) for a in range(3)]
            for b in range(3)], upper


def _lines_planes(loc, Lp: int) -> jnp.ndarray:
    """Grid-line table for graded tensor meshes: (Lp, 128) f32 with
    columns [xs_hi, xs_lo, ys_hi, ys_lo] (exact hi/lo split of the f64
    lines). Pad entries are a large FINITE sentinel — they must compare
    greater than any clamped point (so the interval count ignores them)
    yet multiply to 0.0 under the one-hot selection (inf·0 would be
    NaN)."""
    pad = jnp.float32(1e30)
    out = jnp.zeros((Lp, 128), jnp.float32)
    for col, lines in ((0, loc.xs_lines), (2, loc.ys_lines)):
        n1 = lines.shape[0]
        hi = lines.astype(jnp.float32)
        lo = (lines - hi.astype(jnp.float64)).astype(jnp.float32)
        hi = jnp.concatenate([hi, jnp.full((Lp - n1,), pad)])
        lo = jnp.concatenate([lo, jnp.zeros((Lp - n1,), jnp.float32)])
        out = out.at[:, col].set(hi).at[:, col + 1].set(lo)
    return out


def _make_graded_axis(lines_ref, Lp: int, block: int, nx: int, ny: int):
    """In-kernel searchsorted for graded tensor grids: returns
    (coords_x, coords_y), each mapping a clamped ds coordinate (1, block)
    to (interval index int32 (1, block), local ds coordinate).

    Matches ``mesh.locate._square_index``'s graded branch: interval by
    side="right" searchsorted (= count of lines ≤ p, minus one, clipped),
    then s = (p − line[ix]) / (line[ix+1] − line[ix]). The count is a
    ds-exact comparison against every line; the interval endpoints come
    from an error-free one-hot selection (1.0·x + Σ 0.0·pad)."""
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (Lp, block), 0)
    lines = lines_ref[:]                         # one full (Lp, 128) load

    def make(col, n):
        lh = jnp.broadcast_to(lines[:, col:col + 1], (Lp, block))
        ll = jnp.broadcast_to(lines[:, col + 1:col + 2], (Lp, block))

        def coords(p):
            below = ~ds.gt((lh, ll), p)            # line_j <= p
            # dtype pinned: under x64 jnp.sum would promote the int32
            # accumulator to int64, which Mosaic cannot lower
            cnt = jnp.sum(below.astype(jnp.int32), axis=0, keepdims=True,
                          dtype=jnp.int32)
            # lax.clamp on explicit int32s: jnp.clip's python-int bounds
            # recurse in the Mosaic kernel tracer (weak-type conversion
            # loop under x64)
            ix = jax.lax.clamp(jnp.int32(0), cnt - jnp.int32(1),
                               jnp.int32(n - 1))
            sell = (iota_l == ix).astype(jnp.float32)
            selr = (iota_l == ix + jnp.int32(1)).astype(jnp.float32)
            xl = (jnp.sum(lh * sell, axis=0, keepdims=True),
                  jnp.sum(ll * sell, axis=0, keepdims=True))
            xr = (jnp.sum(lh * selr, axis=0, keepdims=True),
                  jnp.sum(ll * selr, axis=0, keepdims=True))
            s = ds.div(ds.sub(p, xl), ds.sub(xr, xl))
            return ix, s

        return coords

    return make(0, nx), make(2, ny)


def _make_kernel(loc, Hy: int, Hxp: int, nt: int, h: float, block: int,
                 Lp: int = 0, nxp_mask: int = 0):
    """Build the kernel body with all geometry constants baked in.
    ``Lp``/``nxp_mask`` are the padded line-table/active-mask extents for
    graded/hole domains (0 when absent — the kernel then takes no such
    input)."""
    nx, ny = loc.grid_shape
    graded = not loc.uniform
    hole = loc.hole is not None
    if hole:
        hcxc = ds.const(loc.hole[0])
        hcyc = ds.const(loc.hole[1])
        r2c = ds.const(loc.hole[2] * loc.hole[2])
    x0c, y0c = ds.const(loc.origin[0]), ds.const(loc.origin[1])
    hxc, hyc = ds.const(loc.spacing[0]), ds.const(loc.spacing[1])
    hc = ds.const(h)
    xmin, ymin, xmax, ymax = loc.extent
    xminc, yminc = ds.const(xmin), ds.const(ymin)
    xmaxc, ymaxc = ds.const(xmax), ds.const(ymax)
    # boundary-inclusive thresholds (f64 values, ds-exact)
    xmin_e, xmax_e = ds.const(xmin - _EPS), ds.const(xmax + _EPS)
    ymin_e, ymax_e = ds.const(ymin - _EPS), ds.const(ymax + _EPS)
    lshape = loc.domain == "lshape"
    if lshape:
        cxc = ds.const(loc.lshape_corner[0] - _EPS)
        cyc = ds.const(loc.lshape_corner[1] + _EPS)
        cx_clamp = ds.const(loc.lshape_corner[0])
        cy_clamp = ds.const(loc.lshape_corner[1])
        cy_proj = ds.const(loc.lshape_corner[1] - 0.5 * loc.spacing[1])
    diagonal = loc.diagonal

    def bcast(c, ref):
        """ds python-float constant → ds (1, block) arrays."""
        return (jnp.full_like(ref, c[0]), jnp.full_like(ref, c[1]))

    def kernel(*refs):
        it = iter(refs)
        x0h_ref, x0l_ref, planes_ref = next(it), next(it), next(it)
        lines_ref = next(it) if graded else None
        mask_ref = next(it) if hole else None
        (xs_h_ref, xs_l_ref, us_h_ref, us_l_ref,
         failed_ref, kfail_ref) = (next(it) for _ in range(6))

        shape = (1, block)
        zf = jnp.zeros(shape, jnp.float32)

        def C(c):
            return bcast(c, zf)

        iota_y = jax.lax.broadcasted_iota(jnp.int32, (Hy, block), 0)
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (Hxp, block), 0)
        if graded:
            coords_x, coords_y = _make_graded_axis(lines_ref, Lp, block,
                                                   nx, ny)
        if hole:
            iota_my = jax.lax.broadcasted_iota(jnp.int32, (ny, block), 0)
            iota_mx = jax.lax.broadcasted_iota(jnp.int32,
                                               (nxp_mask, block), 0)

        # x0 → trajectory slot 0
        xs_h_ref[0:1, :] = x0h_ref[0:1, :]
        xs_h_ref[nt:nt + 1, :] = x0h_ref[1:2, :]
        xs_l_ref[0:1, :] = x0l_ref[0:1, :]
        xs_l_ref[nt:nt + 1, :] = x0l_ref[1:2, :]
        # u_values[nt-1] = 0 placeholder (overwritten by the host-side
        # final evaluation)
        us_h_ref[nt - 1:nt, :] = zf
        us_h_ref[2 * nt - 1:2 * nt, :] = zf
        us_l_ref[nt - 1:nt, :] = zf
        us_l_ref[2 * nt - 1:2 * nt, :] = zf

        def axis_coords(p, origin_c, spacing_c, n):
            """fx = (p − origin)/h → (int index clamped, local ds coord)."""
            fx = ds.div(ds.sub(p, C(origin_c)), C(spacing_c))
            ixf, frac = ds.floor(fx)
            d = jnp.clip(ixf, np.float32(0.0), np.float32(n - 1))
            s = ds.add_f32(frac, ixf - d)        # exact small-int shift
            return d.astype(jnp.int32), s

        def step(k, carry):
            # NOTE: the fori_loop index ``k`` is int64 under x64 — a dtype
            # Mosaic cannot represent (its i32→i64 convert fallback even
            # recurses infinitely at lowering). Carry an explicit int32
            # step counter instead and never touch ``k``.
            del k
            pxh, pxl, pyh, pyl, failed_i, kfail, kc = carry
            # bool (i1) vector loop carries fail Mosaic's scf.for
            # legalization — carry 0/1 int32 and compare at use
            failed = failed_i > 0
            px, py = (pxh, pxl), (pyh, pyl)

            # --- inside-domain predicate (mesh/locate.py::in_domain) ----
            inside = (~ds.gt(C(xmin_e), px)) & (~ds.gt(px, C(xmax_e))) \
                & (~ds.gt(C(ymin_e), py)) & (~ds.gt(py, C(ymax_e)))
            if lshape:
                inside = inside & ((~ds.gt(py, C(cyc)))
                                   | (~ds.gt(C(cxc), px)))

            # --- clamp to extent (locate_points) ------------------------
            pcx = ds.where(ds.gt(C(xminc), px), C(xminc), px)
            pcx = ds.where(ds.gt(pcx, C(xmaxc)), C(xmaxc), pcx)
            pcy = ds.where(ds.gt(C(yminc), py), C(yminc), py)
            pcy = ds.where(ds.gt(pcy, C(ymaxc)), C(ymaxc), pcy)
            if lshape:
                in_block = ds.gt(C(cx_clamp), pcx) & ds.gt(pcy, C(cy_clamp))
                pcy = ds.where(in_block, C(cy_proj), pcy)

            if graded:
                ix, s = coords_x(pcx)
                iy, t = coords_y(pcy)
            else:
                ix, s = axis_coords(pcx, x0c, hxc, nx)
                iy, t = axis_coords(pcy, y0c, hyc, ny)

            if hole:
                # in_domain's obstacle conditions: exact-circle test on
                # the RAW position, active-square test on the clamped one
                # (mesh/locate.py:136-142)
                dxc, dyc = ds.sub(px, C(hcxc)), ds.sub(py, C(hcyc))
                d2 = ds.add(ds.mul(dxc, dxc), ds.mul(dyc, dyc))
                inside = inside & (~ds.gt(C(r2c), d2))
                rowhot = (iota_my == iy).astype(jnp.float32)
                Rm = jax.lax.dot_general(
                    mask_ref[:], rowhot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)    # (nxp, block)
                act = jnp.sum(
                    Rm * (iota_mx == ix).astype(jnp.float32),
                    axis=0, keepdims=True)
                inside = inside & (act > np.float32(0.5))

            W, _ = _patch_weights_ds(s, t, diagonal)

            # --- exact one-hot MXU row selection ------------------------
            gy0 = 2 * iy                                   # (1, block)
            onehot = jnp.concatenate(
                [(iota_y == (gy0 + r)).astype(jnp.float32)
                 for r in range(3)], axis=1)               # (Hy, 3·block)
            R = jax.lax.dot_general(
                planes_ref[:], onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                # HIGHEST: the default MXU precision truncates the f32
                # operand to bf16, so the "exact" 1.0·x row selection
                # loses mantissa (measured 1.4e-4 trajectory error on
                # hardware); full-f32 passes keep it exact
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)        # (4·Hxp, 3·block)

            gx0 = 2 * ix
            colmask = [(iota_x == (gx0 + c)).astype(jnp.float32)
                       for c in range(3)]                  # 3 × (Hxp, block)

            def patch(p, r, c):
                sub = R[p * Hxp:(p + 1) * Hxp,
                        r * block:(r + 1) * block]
                return jnp.sum(sub * colmask[c], axis=0, keepdims=True)

            # --- ds-weighted patch contraction --------------------------
            uv = []
            for comp in range(2):
                acc = ds.from_f32(zf)
                for r in range(3):
                    for c in range(3):
                        val = (patch(comp, r, c), patch(comp + 2, r, c))
                        acc = ds.add(acc, ds.mul(W[r][c], val))
                uv.append(acc)

            # --- escape bookkeeping (ode/primal.py step) -----------------
            fail_now = (~inside) & (~failed)
            failed_new = failed | (~inside)
            kfail = jnp.where(fail_now, kc, kfail)
            zero_ds = ds.from_f32(zf)
            newx = ds.where(failed_new, px,
                            ds.add(px, ds.mul(C(hc), uv[0])))
            newy = ds.where(failed_new, py,
                            ds.add(py, ds.mul(C(hc), uv[1])))
            recx = ds.where(failed_new, zero_ds, uv[0])
            recy = ds.where(failed_new, zero_ds, uv[1])

            us_h_ref[pl.ds(kc, 1), :] = recx[0]
            us_h_ref[pl.ds(nt + kc, 1), :] = recy[0]
            us_l_ref[pl.ds(kc, 1), :] = recx[1]
            us_l_ref[pl.ds(nt + kc, 1), :] = recy[1]
            xs_h_ref[pl.ds(kc + 1, 1), :] = newx[0]
            xs_h_ref[pl.ds(nt + kc + 1, 1), :] = newy[0]
            xs_l_ref[pl.ds(kc + 1, 1), :] = newx[1]
            xs_l_ref[pl.ds(nt + kc + 1, 1), :] = newy[1]
            return (newx[0], newx[1], newy[0], newy[1],
                    failed_new.astype(jnp.int32), kfail, kc + 1)

        init = (x0h_ref[0:1, :], x0l_ref[0:1, :],
                x0h_ref[1:2, :], x0l_ref[1:2, :],
                jnp.zeros(shape, jnp.int32),
                jnp.full(shape, nt, jnp.int32),
                jnp.zeros((), jnp.int32))
        # int32 loop bounds: python-int bounds give an i64 induction
        # variable under x64, which Mosaic cannot legalize
        _, _, _, _, failed_i, kfail, _ = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(nt - 1), step, init)
        failed_ref[:] = failed_i
        kfail_ref[:] = kfail

    return kernel


def _round_up(n, m):
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("nt", "h", "interpret"))
def _run_pallas_ode(grid: GridEval, u_img: jnp.ndarray, x0: jnp.ndarray,
                    h: float, nt: int, interpret: bool = False):
    """Launch the kernel: u_img (Hy·Hx, 2) f64, x0 (K, 2) f64 →
    (x (K,nt,2) f64, u_rec (K,nt,2) f64, failed (K,), kfail (K,))."""
    loc = grid.locator
    Hy, Hx = grid.hg_shape
    Hxp = _round_up(Hx, 8)
    K = x0.shape[0]
    Kp = _round_up(max(K, 1), _BLOCK)

    # velocity planes, transposed (x-major) and padded: (4·Hxp, Hy) f32 =
    # [ux_hi, uy_hi, ux_lo, uy_lo]
    img = u_img.reshape(Hy, Hx, 2)
    hi = img.astype(jnp.float32)
    lo = (img - hi.astype(jnp.float64)).astype(jnp.float32)
    planes = jnp.concatenate([hi.transpose(2, 1, 0),
                              lo.transpose(2, 1, 0)], axis=0)  # (4, Hx, Hy)
    planes = jnp.pad(planes, ((0, 0), (0, Hxp - Hx), (0, 0)))
    planes = planes.reshape(4 * Hxp, Hy)

    # seeds: pad with the domain center-ish interior point (origin+spacing,
    # always inside; padded lanes are discarded)
    pad_pt = jnp.asarray([loc.origin[0] + loc.spacing[0],
                          loc.origin[1] + loc.spacing[1]], x0.dtype)
    x0p = jnp.concatenate(
        [x0, jnp.broadcast_to(pad_pt, (Kp - K, 2))], axis=0)   # (Kp, 2)
    x0_hi = x0p.astype(jnp.float32)
    x0_lo = (x0p - x0_hi.astype(jnp.float64)).astype(jnp.float32)
    x0_hi = x0_hi.T                                            # (2, Kp)
    x0_lo = x0_lo.T

    nx, ny = loc.grid_shape
    graded = not loc.uniform
    hole = loc.hole is not None
    Lp = _round_up(max(nx, ny) + 1, 8) if graded else 0
    nxp_mask = _round_up(nx, 8) if hole else 0
    kernel = _make_kernel(loc, Hy, Hxp, nt, h, _BLOCK, Lp, nxp_mask)
    nblk = Kp // _BLOCK
    out_shape = [
        jax.ShapeDtypeStruct((2 * nt, Kp), jnp.float32),   # xs hi
        jax.ShapeDtypeStruct((2 * nt, Kp), jnp.float32),   # xs lo
        jax.ShapeDtypeStruct((2 * nt, Kp), jnp.float32),   # us hi
        jax.ShapeDtypeStruct((2 * nt, Kp), jnp.float32),   # us lo
        jax.ShapeDtypeStruct((1, Kp), jnp.int32),          # failed
        jax.ShapeDtypeStruct((1, Kp), jnp.int32),          # kfail
    ]
    # index-map constants must be int32: python-int literals trace to i64
    # under x64 and the index-map func then fails Mosaic legalization
    zero = np.int32(0)
    buoy_spec = pl.BlockSpec((2, _BLOCK), lambda i: (zero, i),
                             memory_space=pltpu.VMEM)
    time_spec = pl.BlockSpec((2 * nt, _BLOCK), lambda i: (zero, i),
                             memory_space=pltpu.VMEM)
    flag_spec = pl.BlockSpec((1, _BLOCK), lambda i: (zero, i),
                             memory_space=pltpu.VMEM)
    extra_inputs, extra_specs = [], []
    if graded:
        extra_inputs.append(_lines_planes(loc, Lp))
        extra_specs.append(pl.BlockSpec((Lp, 128), lambda i: (zero, zero),
                                        memory_space=pltpu.VMEM))
    if hole:
        active = (loc.square_to_cell[:, :, 0] >= 0)        # (ny, nx)
        maskp = jnp.pad(active.T.astype(jnp.float32),
                        ((0, nxp_mask - nx), (0, 0)))      # (nxp, ny)
        extra_inputs.append(maskp)
        extra_specs.append(pl.BlockSpec((nxp_mask, ny),
                                        lambda i: (zero, zero),
                                        memory_space=pltpu.VMEM))
    xs_h, xs_l, us_h, us_l, failed, kfail = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[buoy_spec, buoy_spec,
                  pl.BlockSpec((4 * Hxp, Hy), lambda i: (zero, zero),
                               memory_space=pltpu.VMEM)] + extra_specs,
        out_specs=[time_spec, time_spec, time_spec, time_spec,
                   flag_spec, flag_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(x0_hi, x0_lo, planes, *extra_inputs)

    # In interpret mode the kernel lowers to plain XLA ops; without this
    # barrier XLA:CPU fuses the hi/lo→f64 recombination into the
    # interpreter loop and miscompiles the error-free transforms (measured:
    # us_l word off by ~2⁻²⁵ under jit, exact when the raw outputs are
    # also returned or when eager). No-op on the compiled TPU path.
    xs_h, xs_l, us_h, us_l = jax.lax.optimization_barrier(
        (xs_h, xs_l, us_h, us_l))

    def recombine(hi_a, lo_a):
        v = hi_a.astype(jnp.float64) + lo_a.astype(jnp.float64)
        return v.reshape(2, nt, Kp).transpose(2, 1, 0)[:K]    # (K, nt, 2)

    x = recombine(xs_h, xs_l)
    u_rec = recombine(us_h, us_l)
    return x, u_rec, failed[0, :K] > 0, kfail[0, :K]


def solve_primal_ode_pallas(space: TaylorHoodSpace, grid: GridEval,
                            u: jnp.ndarray, x0: jnp.ndarray, h: float,
                            nt: int, center: jnp.ndarray,
                            interpret: bool = None) -> PrimalODEResult:
    """Drop-in replacement for ``solve_primal_ode`` backed by the fused
    Pallas kernel (same escape semantics; trajectories within ~1e-12 of
    the f64 scan)."""
    if grid is None:
        raise ValueError("pallas ODE backend needs a GridEval "
                         "(build_problem(ode_backend='pallas'))")
    loc = grid.locator
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if nt < 3:
        # trip-count-1 fori_loop is unrolled at trace time; the interpret
        # path then miscompiles the EFT chains on XLA:CPU (barriers in
        # ops/doublesingle.py cover the loop form only). Production nt is
        # int(T/dt)=200; tiny-nt callers get the table-free XLA backend.
        from .primal import solve_primal_ode
        return solve_primal_ode(space, u, x0, h, nt, center, grid=grid)

    u_img = velocity_to_grid(grid, u)
    x, u_values, failed, kfail = _run_pallas_ode(
        grid, u_img, x0, float(h), int(nt), interpret=bool(interpret))
    x_raw = x

    # --- post-loop semantics (ode/primal.py / OCP_dolfin.py:213-229) ----
    eval_u = lambda pts: eval_velocity_grid(grid, u_img, pts)
    u_center, _ = eval_u(center)

    last = x[:, nt - 1]
    last_inside = in_domain(loc, last)
    u_last, _ = eval_u(last)
    u_values = u_values.at[:, nt - 1].set(
        jnp.where(last_inside[:, None], u_last, 0.0))
    x = x.at[:, nt - 1].set(
        jnp.where(last_inside[:, None], last, center))

    ks = jnp.arange(nt)[None, :]
    kf = kfail[:, None]
    u_fail = jnp.where((ks < kf)[..., None], u_values, 0.0)
    u_fail = u_fail + jnp.where((ks == kf + 1)[..., None],
                                u_center[None, None, :], 0.0)
    m = failed[:, None, None]
    x = jnp.where(m, jnp.broadcast_to(center, x.shape), x)
    u_values = jnp.where(m, u_fail, u_values)
    return PrimalODEResult(x, u_values, failed, x_raw, kfail)
