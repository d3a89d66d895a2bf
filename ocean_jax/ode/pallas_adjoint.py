"""Fused adjoint-ODE Pallas TPU kernel: eval + backward μ recursion in ONE
kernel.

The reference's adjoint hot loop (``OCP_dolfin.py:234-252``)

    μ[nt-1] = 0
    μ[k] = μ[k+1] − h ∇u(x[k+1])ᵀ ((u(x[k+1]) − u_d[k+1]) − μ[k+1])

runs in XLA as a batched ∇u evaluation (``ode/pallas_eval.py``) + a
next-valid fill + a six-plane f64 associative scan (``ode/adjoint.py``).
At K=10⁴ that stage measured 0.159 s of the 0.312 s fused-iteration
device time (round-4 profile) — dominated by f64-emulated elementwise
glue around the scan. This kernel runs the WHOLE recursion per buoy
block inside one ``fori_loop``: per backward step it locates x[k+1]
(closed-form half-grid arithmetic or in-kernel searchsorted for graded
tensor grids), selects the 2×2 vertex patch of the P1-projected ∇u image
with an exact one-hot MXU row selection, and applies the μ update — all
in double-single f32 (``ops/doublesingle.py``, ~2⁻⁴⁸ relative), so μ
matches the f64 XLA path to ~1e-12, inside the gradient parity bar.

Semantics mirrored exactly from ``ode/adjoint.py``:

* reuse-previous-∇u on out-of-domain points (``OCP_dolfin.py:242-249``):
  the backward loop carries the last in-domain ∇u (init zeros — the
  next-valid-time fill of the parallel XLA form);
* escaped buoys (reference mode): masked to μ ≡ 0 by the caller
  (``OCP_dolfin.py:237-238``);
* consistent mode (``solve_adjoint_ode_consistent``): a per-buoy valid
  window t ≤ vlimit zeroes the ∇u factor outside the window, making the
  step an identity map there — μ is zero past the window and exact
  inside it.

Supported domains: every structured domain class, as the primal kernel
(``ode/pallas_ode.py``) — uniform square/rectangle ("right"/"left"
diagonal), L-shape, graded tensor grids, obstacle (hole) domains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import doublesingle as ds
from .grideval import GridEval
from .pallas_ode import (_register_mosaic_barrier_lowering, _lines_planes,
                         _make_graded_axis, _round_up)
from .pallas_eval import _p1_patch_weights_ds

_register_mosaic_barrier_lowering()

_EPS = 1e-12      # boundary-inclusive slack, mesh/locate.py:_EPS
_BLOCK = 256


def _make_adjoint_kernel(loc, Gy: int, Gxp: int, nt: int, h: float,
                         block: int, Lp: int = 0, nxp_mask: int = 0):
    """Kernel body with geometry constants baked in. Inputs per block:
    x hi/lo (2·nt, block), r = u−u_d hi/lo (2·nt, block), ∇u image planes
    (8·Gxp, Gy) = [g00,g01,g10,g11]×{hi,lo} x-major, vlimit (1, block)
    int32, optionally graded-line table / hole mask. Outputs μ hi/lo
    (2·nt, block)."""
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

    def kernel(*refs):
        it = iter(refs)
        xs_h_ref, xs_l_ref, rs_h_ref, rs_l_ref, planes_ref = (
            next(it) for _ in range(5))
        lines_ref = next(it) if graded else None
        mask_ref = next(it) if hole else None
        vlim_ref = next(it)
        mu_h_ref, mu_l_ref = next(it), next(it)

        shape = (1, block)
        zf = jnp.zeros(shape, jnp.float32)

        def C(c):
            return (jnp.full_like(zf, c[0]), jnp.full_like(zf, c[1]))

        iota_y = jax.lax.broadcasted_iota(jnp.int32, (Gy, block), 0)
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (Gxp, block), 0)
        if graded:
            coords_x, coords_y = _make_graded_axis(lines_ref, Lp, block,
                                                   nx, ny)
        if hole:
            iota_my = jax.lax.broadcasted_iota(jnp.int32, (ny, block), 0)
            iota_mx = jax.lax.broadcasted_iota(jnp.int32,
                                               (nxp_mask, block), 0)

        vlim = vlim_ref[0:1, :]

        # μ[nt−1] = 0
        mu_h_ref[nt - 1:nt, :] = zf
        mu_h_ref[2 * nt - 1:2 * nt, :] = zf
        mu_l_ref[nt - 1:nt, :] = zf
        mu_l_ref[2 * nt - 1:2 * nt, :] = zf

        def axis_coords(p, origin_c, spacing_c, n):
            fx = ds.div(ds.sub(p, C(origin_c)), C(spacing_c))
            ixf, frac = ds.floor(fx)
            d = jnp.clip(ixf, np.float32(0.0), np.float32(n - 1))
            s = ds.add_f32(frac, ixf - d)
            return d.astype(jnp.int32), s

        def step(i, carry):
            # fori_loop index is i64 under x64 (Mosaic-fatal) — carry an
            # explicit int32 backward time counter kc = nt−2 … 0 instead
            del i
            (mu1h, mu1l, mu2h, mu2l,
             g00h, g00l, g01h, g01l, g10h, g10l, g11h, g11l, kc) = carry
            mu1, mu2 = (mu1h, mu1l), (mu2h, mu2l)
            gc = [[(g00h, g00l), (g01h, g01l)],
                  [(g10h, g10l), (g11h, g11l)]]
            t = kc + jnp.int32(1)

            px = (xs_h_ref[pl.ds(t, 1), :], xs_l_ref[pl.ds(t, 1), :])
            py = (xs_h_ref[pl.ds(nt + t, 1), :],
                  xs_l_ref[pl.ds(nt + t, 1), :])

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
                iy, t_loc = coords_y(pcy)
            else:
                ix, s = axis_coords(pcx, x0c, hxc, nx)
                iy, t_loc = axis_coords(pcy, y0c, hyc, ny)

            if hole:
                # exact-circle test on the RAW position, active-square
                # test on the clamped one (mesh/locate.py:136-142)
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

            W, _ = _p1_patch_weights_ds(s, t_loc, diagonal)

            # --- exact one-hot MXU row selection of the 2×2 patch -------
            onehot = jnp.concatenate(
                [(iota_y == (iy + r)).astype(jnp.float32)
                 for r in range(2)], axis=1)               # (Gy, 2·block)
            R = jax.lax.dot_general(
                planes_ref[:], onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                # HIGHEST: default MXU precision truncates the f32 operand
                # to bf16, losing the exact 1.0·x row selection
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)        # (8·Gxp, 2·block)
            colmask = [(iota_x == (ix + c)).astype(jnp.float32)
                       for c in range(2)]

            def patch(p, r, c):
                sub = R[p * Gxp:(p + 1) * Gxp, r * block:(r + 1) * block]
                return jnp.sum(sub * colmask[c], axis=0, keepdims=True)

            # g components in ds: plane order [g00, g01, g10, g11] hi,
            # then lo at plane offset 4
            g_eval = [[None, None], [None, None]]
            for a in range(2):
                for b in range(2):
                    comp = 2 * a + b
                    acc = ds.from_f32(zf)
                    for rr in range(2):
                        for cc in range(2):
                            val = (patch(comp, rr, cc),
                                   patch(4 + comp, rr, cc))
                            acc = ds.add(acc, ds.mul(W[rr][cc], val))
                    g_eval[a][b] = acc

            # reuse-previous-∇u carry (``OCP_dolfin.py:242-249``): keep
            # the last in-domain value, init zeros
            gc = [[ds.where(inside, g_eval[a][b], gc[a][b])
                   for b in range(2)] for a in range(2)]
            # consistent-mode valid window: zero the ∇u factor outside
            # t ≤ vlimit → identity step (b = −h·0·r = 0 too)
            win = t <= vlim
            zero_ds = ds.from_f32(zf)
            gu = [[ds.where(win, gc[a][b], zero_ds) for b in range(2)]
                  for a in range(2)]

            r1 = (rs_h_ref[pl.ds(t, 1), :], rs_l_ref[pl.ds(t, 1), :])
            r2 = (rs_h_ref[pl.ds(nt + t, 1), :],
                  rs_l_ref[pl.ds(nt + t, 1), :])

            # μ_k = μ_{k+1} − h ∇uᵀ ((u − u_d) − μ_{k+1});
            # (∇uᵀ)_{1·} = (g00, g10), (∇uᵀ)_{2·} = (g01, g11)
            d1 = ds.sub(r1, mu1)
            d2 = ds.sub(r2, mu2)
            mu1_new = ds.sub(mu1, ds.mul(C(hc), ds.add(
                ds.mul(gu[0][0], d1), ds.mul(gu[1][0], d2))))
            mu2_new = ds.sub(mu2, ds.mul(C(hc), ds.add(
                ds.mul(gu[0][1], d1), ds.mul(gu[1][1], d2))))

            mu_h_ref[pl.ds(kc, 1), :] = mu1_new[0]
            mu_l_ref[pl.ds(kc, 1), :] = mu1_new[1]
            mu_h_ref[pl.ds(nt + kc, 1), :] = mu2_new[0]
            mu_l_ref[pl.ds(nt + kc, 1), :] = mu2_new[1]
            return (mu1_new[0], mu1_new[1], mu2_new[0], mu2_new[1],
                    gc[0][0][0], gc[0][0][1], gc[0][1][0], gc[0][1][1],
                    gc[1][0][0], gc[1][0][1], gc[1][1][0], gc[1][1][1],
                    kc - jnp.int32(1))

        init = (zf, zf, zf, zf,              # μ = 0
                zf, zf, zf, zf, zf, zf, zf, zf,   # ∇u carry = 0
                jnp.full((), nt - 2, jnp.int32))
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nt - 1), step, init)

    return kernel


def _run_adjoint(grid: GridEval, g_img: jnp.ndarray, x: jnp.ndarray,
                 resid: jnp.ndarray, vlimit: jnp.ndarray, h: float,
                 nt: int, interpret: bool = False) -> jnp.ndarray:
    """Launch the kernel. g_img (Gy·Gx, 4) f64 ∇u vertex image; x and
    resid = u_values − u_d: (K, nt, 2) f64; vlimit (K,) int32 (valid
    window t ≤ vlimit; pass nt for the unrestricted reference recursion).
    Returns μ (K, nt, 2) f64 (mask escaped buoys outside)."""
    loc = grid.locator
    Gy, Gx = grid.vg_shape
    Gxp = _round_up(Gx, 8)
    K = x.shape[0]
    Kp = _round_up(max(K, 1), _BLOCK)

    img = g_img.reshape(Gy, Gx, 4)
    hi = img.astype(jnp.float32)
    lo = (img - hi.astype(jnp.float64)).astype(jnp.float32)
    planes = jnp.concatenate([hi.transpose(2, 1, 0),
                              lo.transpose(2, 1, 0)], axis=0)  # (8, Gx, Gy)
    planes = jnp.pad(planes, ((0, 0), (0, Gxp - Gx), (0, 0)))
    planes = planes.reshape(8 * Gxp, Gy)

    def to_planes(arr):
        """(Kp, nt, 2) f64 → hi/lo (2·nt, Kp) f32 pair."""
        a = arr.transpose(2, 1, 0).reshape(2 * nt, Kp)
        ah = a.astype(jnp.float32)
        al = (a - ah.astype(jnp.float64)).astype(jnp.float32)
        return ah, al

    # padding lanes: an interior point (always inside, harmless values)
    pad_pt = jnp.asarray([loc.origin[0] + loc.spacing[0],
                          loc.origin[1] + loc.spacing[1]], x.dtype)
    xs_h, xs_l = to_planes(jnp.concatenate(
        [x, jnp.broadcast_to(pad_pt, (Kp - K, nt, 2))], axis=0))
    rs_h, rs_l = to_planes(jnp.concatenate(
        [resid, jnp.zeros((Kp - K, nt, 2), resid.dtype)], axis=0))

    vl = jnp.concatenate(
        [vlimit.astype(jnp.int32),
         jnp.zeros((Kp - K,), jnp.int32)])[None, :]          # (1, Kp)

    nx, ny = loc.grid_shape
    graded = not loc.uniform
    hole = loc.hole is not None
    Lp = _round_up(max(nx, ny) + 1, 8) if graded else 0
    nxp_mask = _round_up(nx, 8) if hole else 0
    kernel = _make_adjoint_kernel(loc, Gy, Gxp, nt, h, _BLOCK, Lp,
                                  nxp_mask)
    zero = np.int32(0)
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
        active = (loc.square_to_cell[:, :, 0] >= 0)          # (ny, nx)
        maskp = jnp.pad(active.T.astype(jnp.float32),
                        ((0, nxp_mask - nx), (0, 0)))        # (nxp, ny)
        extra_inputs.append(maskp)
        extra_specs.append(pl.BlockSpec((nxp_mask, ny),
                                        lambda i: (zero, zero),
                                        memory_space=pltpu.VMEM))
    mu_h, mu_l = pl.pallas_call(
        kernel,
        grid=(Kp // _BLOCK,),
        in_specs=[time_spec, time_spec, time_spec, time_spec,
                  pl.BlockSpec((8 * Gxp, Gy), lambda i: (zero, zero),
                               memory_space=pltpu.VMEM)]
        + extra_specs + [flag_spec],
        out_specs=[time_spec, time_spec],
        out_shape=[jax.ShapeDtypeStruct((2 * nt, Kp), jnp.float32)] * 2,
        interpret=interpret,
    )(xs_h, xs_l, rs_h, rs_l, planes, *extra_inputs, vl)

    # interpret-mode EFT guard (see ode/pallas_ode.py) — no-op on TPU
    mu_h, mu_l = jax.lax.optimization_barrier((mu_h, mu_l))
    mu = mu_h.astype(jnp.float64) + mu_l.astype(jnp.float64)
    return mu.reshape(2, nt, Kp).transpose(2, 1, 0)[:K]      # (K, nt, 2)


# Compiled TPU path jits once per shape; interpret mode stays EAGER (the
# XLA:CPU compile of the lowered interpreter body is pathologically slow,
# while eager interpretation of a few blocks takes seconds — same policy
# as ode/pallas_eval.py).
_run_adjoint_jit = jax.jit(_run_adjoint,
                           static_argnames=("h", "nt", "interpret"))


def solve_adjoint_ode_pallas(grid: GridEval, grad_u: jnp.ndarray,
                             x: jnp.ndarray, u_values: jnp.ndarray,
                             u_d: jnp.ndarray, mask: jnp.ndarray,
                             h: float, vlimit: jnp.ndarray = None,
                             interpret: bool = None) -> jnp.ndarray:
    """Drop-in for ``solve_adjoint_ode(…, method="parallel")`` backed by
    the fused kernel. grad_u: (n_p1, 2, 2) P1 field; x, u_values, u_d:
    (K, nt, 2); mask (K,) bool (reference mode: escaped buoys → μ ≡ 0).
    ``vlimit`` (K,) int32: consistent-mode valid window t ≤ vlimit (pass
    kfail−1 for escaped lanes); None = unrestricted."""
    from .grideval import grad_to_grid
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    K, nt, _ = x.shape
    if nt < 3:
        # tiny-nt callers take the XLA backend (trip-count-1 fori_loop
        # unrolls at trace time and the interpret path then miscompiles
        # the EFT chains — same policy as the primal kernel)
        from .adjoint import _adjoint_ode_parallel
        valid = None if vlimit is None else (
            jnp.arange(nt)[None, :] <= vlimit[:, None])
        return _adjoint_ode_parallel(None, grad_u, x, u_values, u_d,
                                     mask, h, valid=valid, grid=grid)
    g_img = grad_to_grid(grid, grad_u).reshape(-1, 4)
    vl = (jnp.full((K,), nt, jnp.int32) if vlimit is None
          else vlimit.astype(jnp.int32))
    resid = u_values - u_d
    runner = _run_adjoint if interpret else _run_adjoint_jit
    mu = runner(grid, g_img, x, resid, vl, float(h), int(nt),
                interpret=bool(interpret))
    return jnp.where(mask[:, None, None], 0.0, mu)
