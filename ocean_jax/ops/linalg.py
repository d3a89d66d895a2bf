"""Mixed-precision dense linear algebra for the saddle-point solves.

The reference delegates every linear solve to PETSc's sparse LU
(``OCP_dolfin.py:325,371``). On TPU the MXU has no native float64, so the
TPU-native design is:

  * factorize the operator once in float32 (fast, MXU/blocked LU),
  * recover float64 accuracy by iterative refinement, computing residuals
    with an *exact* float64 matrix-free apply (element-level einsum — see
    ``ocean_jax.fem.assemble.Operator.matvec64``) and correcting through the
    float32 factors.

With cond(A)·eps32 ≪ 1 each sweep contracts the error by ~cond(A)·eps32;
a handful of sweeps reaches ~1e-12 relative residuals, matching the direct
fp64 LU the reference relies on.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LUSolver:
    """float32 LU factors of a dense operator."""

    lu: jnp.ndarray
    piv: jnp.ndarray

    def tree_flatten(self):
        return ((self.lu, self.piv), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def solve32(self, b: jnp.ndarray) -> jnp.ndarray:
        return jsl.lu_solve((self.lu, self.piv),
                            b.astype(jnp.float32)).astype(jnp.float64)

    def solve32_raw(self, b: jnp.ndarray) -> jnp.ndarray:
        """As ``solve32`` but keeps the float32 result — for all-f32
        chord-correction loops where the f64 round-trip is pure
        emulated-arithmetic overhead."""
        return jsl.lu_solve((self.lu, self.piv), b.astype(jnp.float32))

    def solve32_t(self, b: jnp.ndarray) -> jnp.ndarray:
        """Solve Aᵀ x = b through the SAME factors (trans=1): one LU
        factorization serves both the primal operator and its transpose —
        the enabler of the factorization-free adjoint solve (the adjoint
        NS operator is the transposed Newton Jacobian for ν=1, see
        ``solve/linear.py::solve_operator_reuse_t``)."""
        return jsl.lu_solve((self.lu, self.piv),
                            b.astype(jnp.float32), trans=1).astype(jnp.float64)


    def refactor(self, a: jnp.ndarray) -> "LUSolver":
        """Rebuild the same solver kind from a fresh matrix (class-generic
        hook for jit branches that must produce a matching pytree)."""
        return factorize(a)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class InvSolver:
    """Explicit float32 inverse with the ``LUSolver`` apply interface.

    Sequential blocked triangular solves (``lu_solve``) are
    latency-bound on TPU — ~9 ms per RHS at n≈9.5k, and the refinement
    loop issues dozens of them per GD iteration (the 0.30 s
    ``lu_triangular_solves`` bucket of the fused-program profile). This
    solver pays the triangular solves ONCE — n RHS at a time, where the
    blocked trsm is matmul-dominated — and every subsequent
    ``solve32``/``solve32_t`` is a single MXU matmul (HBM-bound:
    ~0.5 ms at n≈9.5k). Same float32 accuracy class as LU solves; the
    float64 iterative refinement absorbs the difference exactly as it
    does for the mg leaf inverse (``solve/mg.py``).
    """

    ainv: jnp.ndarray                 # (n, n) float32
    # optional explicit A⁻ᵀ: ``b @ ainv`` reduces over the MAJOR axis of
    # the row-major inverse, which the TPU executes as a strided pass an
    # order of magnitude slower than the natural ``ainv_t @ b`` (the
    # transposed copy costs one extra n² f32 buffer, materialized once at
    # problem build by ``with_transpose``; hot adjoint paths ask for it)
    ainv_t: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return ((self.ainv, self.ainv_t), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def solve32(self, b: jnp.ndarray) -> jnp.ndarray:
        return (self.ainv @ b.astype(jnp.float32)).astype(jnp.float64)

    def solve32_raw(self, b: jnp.ndarray) -> jnp.ndarray:
        """One MXU matmul, float32 in/out (see ``LUSolver.solve32_raw``)."""
        return self.ainv @ b.astype(jnp.float32)

    def solve32_t(self, b: jnp.ndarray) -> jnp.ndarray:
        """(Aᵀ)⁻¹ b = A⁻ᵀ b — transposed-matmul apply (same products
        either way; float64 refinement absorbs any reduction-order ulps)."""
        if self.ainv_t is not None:
            return (self.ainv_t @ b.astype(jnp.float32)).astype(jnp.float64)
        return (b.astype(jnp.float32) @ self.ainv).astype(jnp.float64)

    def with_transpose(self) -> "InvSolver":
        """Materialize the A⁻ᵀ copy for fast ``solve32_t`` applies."""
        return InvSolver(self.ainv, self.ainv.T)

    def refactor(self, a: jnp.ndarray) -> "InvSolver":
        # preserve the pytree structure (jit branches must match)
        s = invert32(a)
        return s.with_transpose() if self.ainv_t is not None else s


def factorize(a: jnp.ndarray) -> LUSolver:
    """LU-factorize a dense matrix in float32."""
    lu, piv = jsl.lu_factor(a.astype(jnp.float32))
    return LUSolver(lu, piv)


def invert32(a: jnp.ndarray, chunk: int = 512) -> InvSolver:
    """Explicit float32 inverse, built IN-PROGRAM (jit-compatible).

    One LU factorization, then identity columns solved ``chunk`` at a
    time under ``lax.map`` — bounding XLA's TriangularSolve working set
    to ~(n/256)·n·chunk·4 bytes (an unchunked n×n RHS demands ~13.5 GB
    at n=9.5k; see ``explicit_inverse_host`` for the host-staged variant
    used at mg-leaf scale)."""
    a32 = a.astype(jnp.float32)
    n = a32.shape[0]
    fac = factorize(a32)
    n_pad = ((n + chunk - 1) // chunk) * chunk

    def solve_block(start):
        e = jnp.zeros((n, chunk), jnp.float32)
        cols = jnp.clip(start + jnp.arange(chunk), 0, n - 1)
        e = e.at[cols, jnp.arange(chunk)].set(1.0)
        return jsl.lu_solve((fac.lu, fac.piv), e)

    blocks = jax.lax.map(solve_block,
                         jnp.arange(0, n_pad, chunk))     # (nb, n, chunk)
    ainv = jnp.moveaxis(blocks, 0, 1).reshape(n, n_pad)[:, :n]
    return InvSolver(ainv)


def solve_refined(fac: LUSolver, matvec64: Callable[[jnp.ndarray], jnp.ndarray],
                  b: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Solve A x = b to float64 accuracy via iterative refinement.

    ``matvec64`` must be the exact float64 action of the SAME operator the
    float32 factors approximate (including identity rows on Dirichlet dofs).
    """
    x = fac.solve32(b)

    def body(_, x):
        r = b - matvec64(x)
        return x + fac.solve32(r)

    return jax.lax.fori_loop(0, iters, body, x)


def solve_dense(a64: jnp.ndarray, b: jnp.ndarray, iters: int = 12
                ) -> jnp.ndarray:
    """One-shot mixed-precision dense solve (small systems, e.g. the P1
    projection mass matrix)."""
    fac = factorize(a64)
    return solve_refined(fac, lambda x: a64 @ x, b, iters)


# XLA's TPU blocked LU stages an (N, 128) fp32 panel in scoped VMEM; the
# default 16 MB limit caps factorizations at ~15.6k dofs. 64 MB unlocks
# ~60k (v5e VMEM is 128 MB physical).
LARGE_LU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": 65536}


def _maybe_large_lu_jit(fn):
    if jax.default_backend() == "tpu":
        return jax.jit(fn, compiler_options=LARGE_LU_COMPILER_OPTIONS)
    return jax.jit(fn)


def explicit_inverse_host(a: jnp.ndarray, chunk: int = 512,
                          newton_schulz: int = 1,
                          progress_path: str = None) -> jnp.ndarray:
    """Explicit f32 inverse of a large dense matrix, built as a sequence
    of memory-bounded device programs (host-orchestrated).

    ``jnp.linalg.inv`` inside one program is unusable past ~10k on TPU:
    XLA's blocked TriangularSolve keeps ~n/256 live copies of the n×n RHS
    (measured 104.6 GB demanded at n=18.8k). Here: one LU factorization
    program (raised scoped-VMEM limit), then identity columns solved in
    ``chunk``-wide programs (each bounded by ~(n/256)·n·chunk·4 bytes),
    then ``newton_schulz`` refinement steps X ← X(2I − AX) as matmul
    programs — the refinement restores the accuracy an explicit f32
    inverse loses on ill-conditioned blocks.

    One-time setup cost per problem; the result makes every downstream
    coarse solve a single MXU matmul.

    ``progress_path``: crash-resume checkpoint of the solved column
    blocks — the chunk loop moves GBs through the remote-TPU tunnel and
    is exposed to worker crashes; a retried build resumes at the first
    unsolved chunk (completed-chunk count stored alongside the columns).
    """
    a = a.astype(jnp.float32)
    n = a.shape[0]
    fac = _maybe_large_lu_jit(factorize)(a)

    # columns staged through HOST memory: the device holds only one
    # chunk's triangular-solve working set at a time (XLA's unrolled
    # block steps keep ~n/256 copies of the chunk alive — chunk width
    # bounds that to (n/256)·n·chunk·4 bytes)
    import numpy as _np
    solve_chunk = _maybe_large_lu_jit(
        lambda lu, piv, e: jsl.lu_solve((lu, piv), e))
    cols = _np.empty((n, n), dtype=_np.float32)
    done = 0
    if progress_path is not None and os.path.exists(progress_path):
        st = _np.load(progress_path)
        if st["cols"].shape == (n, n) and int(st["chunk"]) == chunk:
            cols[:] = st["cols"]
            done = int(st["done"])
    for start in range(done * chunk, n, chunk):
        width = min(chunk, n - start)
        e = jnp.zeros((n, width), jnp.float32).at[
            start + jnp.arange(width), jnp.arange(width)].set(1.0)
        cols[:, start:start + width] = _np.asarray(
            solve_chunk(fac.lu, fac.piv, e))
        i_chunk = start // chunk + 1
        # checkpoint every 8 chunks (a full-matrix write per chunk would
        # cost ~50 GB of disk traffic at n=18.8k)
        if progress_path is not None and (
                i_chunk % 8 == 0 or start + width >= n):
            tmp = progress_path + ".tmp"
            with open(tmp, "wb") as fh:
                _np.savez(fh, cols=cols, done=i_chunk, chunk=chunk)
            os.replace(tmp, progress_path)
    ainv = jnp.asarray(cols)

    # X(2I − AX) = 2X − X(AX): no n×n identity materialized, ~5 live
    # n×n buffers
    ns_step = _maybe_large_lu_jit(
        lambda ainv, a: 2.0 * ainv - ainv @ (a @ ainv))
    for _ in range(newton_schulz):
        ainv = ns_step(ainv, a)
    return ainv
