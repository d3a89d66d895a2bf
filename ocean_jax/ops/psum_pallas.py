"""Pallas TPU kernel for the Ozaki-sliced exact segment sum.

Same math as ``ops/scatter.py::ozaki_segment_sum`` (f64 values decomposed
into 8-bit-integer bf16 pieces; one-hot contraction per chunk with exact
f32 MXU accumulation; error-free TwoSum carry across chunks) but with the
one-hot matrix built IN VMEM per grid step instead of materialized to HBM:
the XLA scan writes+reads M·(S+1) one-hot bytes through HBM (~17 GB at
K=10⁴ buoys, Nx=32), which this kernel eliminates entirely — HBM traffic
drops to the pieces array re-read once per segment tile.

Replaces the reference's K×200×2 sequential ``PointSource.apply`` calls
(``OCP_dolfin.py:353-366``) at the kernel level; used by
``adjoint/point_sources.py`` via ``psrc_method="ozaki_pallas"``.

Layout (one grid step): onehot (s_tile × chunk) bf16 built from a
row-iota == lane-broadcast compare (the Mosaic one-hot idiom of
``ode/pallas_ode.py:217-226``), contracted against the (chunk × P) bf16
piece block on the MXU with f32 accumulation; hi/lo f32 output blocks are
revisited across the chunk grid dimension (rightmost = fastest) so the
TwoSum carry stays VMEM-resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# chunks processed per grid step: Mosaic requires the last two dims of
# every block to be (8, 128)-divisible or full — an ids block of a single
# (1, chunk) row violates the sublane rule on hardware (it only ever
# compiled in CPU interpret mode). Grouping 8 chunk rows per step keeps
# the ids block (8, chunk)-aligned; the in-kernel row slices are static.
_ROWS = 8


def _kernel(ids_ref, pieces_ref, hi_ref, lo_ref, *, s_tile: int,
            chunk: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        hi_ref[:] = jnp.zeros(hi_ref.shape, hi_ref.dtype)
        lo_ref[:] = jnp.zeros(lo_ref.shape, lo_ref.dtype)

    seg0 = pl.program_id(0) * s_tile
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s_tile, chunk), 0)
    for r in range(_ROWS):
        # onehot[s, m] = (seg0 + s == ids[r, m]) — rows are segments of
        # this tile, lanes are chunk r's points
        onehot = (iota_s + seg0 == ids_ref[r:r + 1, :]).astype(jnp.bfloat16)
        # EXACT f32 sums: bf16 {0,1} × bf16 8-bit integers, ≤ chunk ≤ 2¹¹
        # addends of magnitude ≤ 2⁷ per output element (2¹⁸ < 2²⁴)
        part = jax.lax.dot_general(
            onehot, pieces_ref[r * chunk:(r + 1) * chunk, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (s_tile, P)
        # error-free TwoSum carry (integer-valued addends → `lo` exact;
        # all addends are exact in f32, so the regrouped order is
        # bit-identical to the one-chunk-per-step original)
        h = hi_ref[:]
        s = h + part
        bb = s - h
        e = (h - (s - bb)) + (part - bb)
        hi_ref[:] = s
        lo_ref[:] = lo_ref[:] + e


@functools.partial(jax.jit, static_argnames=("num_segments", "chunk",
                                             "slices", "s_tile",
                                             "interpret"))
def ozaki_segment_sum_pallas(seg_ids: jnp.ndarray, values: jnp.ndarray,
                             num_segments: int, chunk: int = 1024,
                             slices: int = 8, s_tile: int = 1024,
                             interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ``scatter.ozaki_segment_sum`` (same contract: ids in
    [0, num_segments], == num_segments → dropped padding bin)."""
    m, d = values.shape
    out_dtype = values.dtype
    v = values.astype(jnp.float64) if out_dtype != jnp.float64 else values
    maxabs = jnp.max(jnp.abs(v), axis=0)
    scale = jnp.exp2(jnp.ceil(jnp.log2(jnp.where(maxabs > 0, maxabs, 1.0))))
    r = v / scale
    pieces = []
    for k in range(slices):
        g = 2.0 ** (7 + 8 * k)
        c = jnp.round(r * g)
        pieces.append(c.astype(jnp.bfloat16))
        r = r - c / g
    p = jnp.stack(pieces, axis=1).reshape(m, slices * d)   # (M, P)

    group = _ROWS * chunk
    m_pad = ((m + group - 1) // group) * group
    ids = jnp.concatenate(
        [seg_ids.astype(jnp.int32),
         jnp.full(m_pad - m, num_segments, jnp.int32)]).reshape(-1, chunk)
    p = jnp.concatenate(
        [p, jnp.zeros((m_pad - m, slices * d), jnp.bfloat16)])
    n_groups = m_pad // group
    s_pad = ((num_segments + 1 + s_tile - 1) // s_tile) * s_tile
    n_stiles = s_pad // s_tile
    pp = slices * d

    # np.int32 literals in the index maps: a bare python 0 traces to an
    # i64 constant under x64, which Mosaic cannot legalize (same idiom as
    # ode/pallas_ode.py:337)
    zero = np.int32(0)
    hi, lo = pl.pallas_call(
        functools.partial(_kernel, s_tile=s_tile, chunk=chunk),
        grid=(n_stiles, n_groups),
        in_specs=[
            pl.BlockSpec((_ROWS, chunk), lambda i, j: (j, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS * chunk, pp), lambda i, j: (j, zero),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((s_tile, pp), lambda i, j: (i, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_tile, pp), lambda i, j: (i, zero),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s_pad, pp), jnp.float32),
            jax.ShapeDtypeStruct((s_pad, pp), jnp.float32),
        ],
        interpret=interpret,
    )(ids, p)

    # interpret mode lowers the kernel to plain XLA ops; the barrier stops
    # XLA:CPU from fusing the hi/lo recombination into the loop and
    # re-associating the error-free TwoSum (same guard as
    # ode/pallas_ode.py:356-361). No-op on the compiled TPU path.
    hi, lo = jax.lax.optimization_barrier((hi, lo))
    acc = (hi.astype(jnp.float64)
           + lo.astype(jnp.float64))[:num_segments + 1]
    acc = acc.reshape(num_segments + 1, slices, d)
    w = jnp.asarray([2.0 ** -(7 + 8 * k) for k in range(slices)])
    out = jnp.einsum("skd,k->sd", acc, w) * scale[None, :]
    return out[:num_segments].astype(out_dtype)
