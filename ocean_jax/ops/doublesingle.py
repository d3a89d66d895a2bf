"""Double-single (float32 pair) arithmetic for TPU kernels.

The TPU MXU/VPU have no float64 datapath — XLA emulates f64 in software
(the reason the f64 FGMRES inner loops measured 12× slower than f32,
``solve/mg.py``), and Pallas/Mosaic has no f64 at all. Double-single
represents a real as an unevaluated sum ``hi + lo`` of two float32 with
``|lo| ≤ ulp(hi)/2`` (~2⁻⁴⁸ ≈ 4e-15 relative accuracy), using the classic
error-free transformations (Knuth two-sum, Dekker two-product with a
Veltkamp split — TPU f32 ops are IEEE round-to-nearest, so no FMA is
required).

Used by the fused primal-ODE Pallas kernel (``ode/pallas_ode.py``) to
hold buoy positions and interpolated velocities to f64-equivalent
accuracy (the golden-parity bar is 1e-9 over 200 Euler steps,
VERDICT r1 item 4). All functions are shape-polymorphic elementwise jnp
ops — usable inside Pallas kernels and in plain XLA alike.

A ds value is a ``(hi, lo)`` tuple of equal-shape float32 arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SPLIT = np.float32(4097.0)     # 2^12 + 1 (Veltkamp split point for f32)


def _nofuse(x):
    """Block FMA contraction. The compiler backend (LLVM on CPU; Mosaic on
    TPU) may fuse ``a*b ± c`` into an FMA — which silently breaks the
    Veltkamp-split two_prod (measured: the error word degenerates to f32
    noise under jit, while eager mode is exact). Every product that feeds
    an add/sub inside an EFT goes through this barrier."""
    return jax.lax.optimization_barrier(x)


# --- error-free transformations --------------------------------------------

def two_sum(a, b):
    """s + e == a + b exactly (Knuth, 6 flops, no magnitude assumption).

    The barrier on ``s`` keeps the algebraic simplifier from cancelling
    ``(a + b) − a → b`` (observed on XLA:CPU once a trip-count-1 loop is
    inlined), which would zero the error word."""
    s = _nofuse(a + b)
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """s + e == a + b exactly, REQUIRES |a| >= |b| (Dekker, 3 flops)."""
    s = _nofuse(a + b)
    e = b - (s - a)
    return s, e


def _veltkamp(a):
    t = _nofuse(_SPLIT * a)
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly (Dekker two-product via Veltkamp split)."""
    p = _nofuse(a * b)
    ah, al = _veltkamp(a)
    bh, bl = _veltkamp(b)
    e = ((_nofuse(ah * bh) - p) + _nofuse(ah * bl)
         + _nofuse(al * bh)) + _nofuse(al * bl)
    return p, e


# --- ds constructors ---------------------------------------------------------

def from_f64(v):
    """float64 scalar/array (or python float) → ds pair. Trace-time helper
    — do NOT call inside a Pallas kernel (f64 is unavailable there); bake
    scalar constants via this at closure-capture time instead."""
    v = jnp.asarray(v, jnp.float64)
    hi = v.astype(jnp.float32)
    lo = (v - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def const(v):
    """Python float → (hi, lo) pair of *numpy* float32 scalars (static
    kernel constants, exact at trace time)."""
    hi = np.float32(v)
    lo = np.float32(v - np.float64(hi))
    return hi, lo


def to_f64(x):
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


def from_f32(a):
    return a, jnp.zeros_like(a)


# --- ds arithmetic -----------------------------------------------------------

def add(x, y):
    """Accurate ds addition (Briggs): stays exact under cancellation —
    buoy-position increments and the s = fx − ix fraction both difference
    nearly-equal values."""
    s, e = two_sum(x[0], y[0])
    t, f = two_sum(x[1], y[1])
    s, e = fast_two_sum(s, e + t)
    return fast_two_sum(s, e + f)


def neg(x):
    return -x[0], -x[1]


def sub(x, y):
    return add(x, neg(y))


def mul(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(p, e)


def scale_exact(x, c):
    """Multiply by an exactly-representable f32 (power of two, small int):
    error-free, 2 flops."""
    return x[0] * c, x[1] * c


def div(x, d):
    """x / d with one refinement step (~2⁻⁴⁵ relative)."""
    q1 = x[0] / d[0]
    p, pe = two_prod(q1, d[0])
    r = sub(sub(x, (p, pe)), from_f32(q1 * d[1]))
    q2 = (r[0] + r[1]) / d[0]
    return fast_two_sum(q1, q2)


def add_f32(x, a):
    s, e = two_sum(x[0], a)
    return fast_two_sum(s, e + x[1])


def where(pred, x, y):
    return jnp.where(pred, x[0], y[0]), jnp.where(pred, x[1], y[1])


# --- comparisons / rounding --------------------------------------------------

def gt(x, y):
    d = sub(x, y)
    return (d[0] > 0) | ((d[0] == 0) & (d[1] > 0))


def floor(x):
    """(f, frac) with f = floor(x) as f32 and frac = x − f as ds ∈ [0, 1)."""
    f = jnp.floor(x[0])
    s, e = two_sum(x[0], -f)             # x[0] − f exactly (x[0]−f can round)
    frac = fast_two_sum(s, e + x[1])
    # carry fixes: x[1] can push the fraction out of [0, 1) — compare the
    # full ds value, not just the hi word (frac can be (1.0, −1e-12) < 1)
    over = (frac[0] > 1.0) | ((frac[0] == 1.0) & (frac[1] >= 0.0))
    under = (frac[0] < 0.0) | ((frac[0] == 0.0) & (frac[1] < 0.0))
    # strong-f32 select constants: python-float literals are weak f64
    # under x64 and would materialize f64 selects — fatal inside Mosaic
    # kernels (no 64-bit layouts)
    one, zero = np.float32(1.0), np.float32(0.0)
    f = f + jnp.where(over, one, zero) - jnp.where(under, one, zero)
    shift = jnp.where(over, -one, jnp.where(under, one, zero))
    s, e = two_sum(frac[0], shift)       # the carry can round: keep its error
    return f, fast_two_sum(s, e + frac[1])
