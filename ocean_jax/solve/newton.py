"""Newton solver for the stationary Navier–Stokes system.

TPU-native replacement for dolfin's ``solve(F == 0, w, bcs)``
(``OCP_dolfin.py:325``): a ``lax.while_loop`` Newton iteration whose linear
steps use the float32 dense LU (``ocean_jax.ops.linalg``). Convergence
criteria match dolfin's ``NewtonSolver`` defaults (residual criterion,
relative tolerance 1e-9, absolute tolerance 1e-10, 50 iterations), the same
defaults the reference relies on.

Dirichlet rows follow dolfin semantics: the residual entry at a constrained
dof is ``w[dof] - g`` and the Jacobian row is identity, so the first Newton
step lands exactly on the BC and stays there.

The Newton *steps* are solved with the float32 factors only (inexact
Newton): near the root each step still contracts the fp64-assembled
residual by ~1e-4×, so the fp64 stopping test is reached — the converged
state carries full float64 accuracy without any fp64 factorization.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import linalg


class NewtonResult(NamedTuple):
    w: jnp.ndarray
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray
    converged: jnp.ndarray
    # float32 LU factors of the last Jacobian the solver factorized
    # (J(w0) under reuse_factorization, else the final iteration's
    # Jacobian). Downstream the adjoint solve reuses them TRANSPOSED as
    # its preconditioner — for ν=1 the reference's adjoint operator IS
    # the transposed Newton Jacobian (OCP_dolfin.py:344-347 vs :321-322),
    # so one factorization per GD iteration serves both saddle solves
    # (solve/linear.py::solve_operator_reuse_t). None on the matrix-free
    # mg path.
    fac: Optional[linalg.LUSolver] = None


def newton_solve(residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
                 operator_fn: Callable[[jnp.ndarray], "object"],
                 w0: jnp.ndarray,
                 bc_dofs: jnp.ndarray,
                 bc_vals: jnp.ndarray,
                 rtol: float = 1e-9,
                 atol: float = 1e-10,
                 max_iter: int = 50,
                 reuse_factorization: bool = False,
                 correction_iters: int = 1,
                 fac0: Optional[linalg.LUSolver] = None,
                 residual_fn32: Optional[Callable[[jnp.ndarray],
                                                  jnp.ndarray]] = None
                 ) -> NewtonResult:
    """Solve residual(w) = 0 with BC-aware Newton.

    residual_fn: raw residual (no BC rows) in float64.
    operator_fn: w → fem.assemble.Operator (the Jacobian with BC rows).

    reuse_factorization=True factorizes only the FIRST Jacobian; later
    Newton steps solve J_k δ = −r through the stale factors with
    ``correction_iters`` preconditioned-Richardson sweeps against the
    exact current-Jacobian matvec (δ ← δ + M⁻¹(−r − J_k δ)). The LU is the
    dominant per-iteration cost on TPU (~0.2 s vs ~0.05 s assembly at
    Nx=32), so this trades one factorization for a few cheap matvec/
    triangular-solve sweeps; the convergence test is unchanged (fp64
    residual), so accuracy is unaffected — only the step quality.

    ``fac0``: precomputed float32 LU factors of J(w0). For the standard
    w0 = 0 start the Jacobian is the STOKES operator — control-independent
    and therefore problem-constant — so production callers factorize it
    once per problem (``system.build_problem``) and every GD iteration,
    including each Armijo line-search probe, runs with ZERO in-program
    factorizations (the factorize below is bitwise the same computation,
    just hoisted out of the iteration).

    ``residual_fn32``: optional float32 twin of ``residual_fn`` (same
    form, float32 basis/geometry tables). When given (and
    ``reuse_factorization``), the correction sweeps — linearization,
    jvp evaluations, preconditioner applies — run entirely in native
    float32: the step they polish is limited by the stale-factor
    Richardson contraction (~1e-3 relative), three decades above f32
    roundoff, so the chord convergence RATE is unchanged while the
    per-step cost drops (TPU f64 is software-emulated; the f64 residual
    of the convergence test is still evaluated once per step, so the
    accepted state carries full float64 accuracy either way — converged
    states of the two modes differ only below the 1e-9·r0 stopping
    threshold).
    """

    def bc_residual(w):
        r = residual_fn(w)
        return r.at[bc_dofs].set(w[bc_dofs] - bc_vals)

    r0 = bc_residual(w0)
    r0norm = jnp.linalg.norm(r0)
    if fac0 is None:
        fac0 = linalg.factorize(operator_fn(w0).dense())

    if reuse_factorization:
        # fac0 is closed over, NOT carried: it is loop-invariant (a
        # loop-variant 364 MB factor buffer costs ~1 s/GD-iter in
        # copies). Stale-factor corrections can diverge to NaN when
        # the Jacobian drifts far from J(w0) (advection-dominated
        # regimes where even exact Newton stalls) — production
        # drivers detect the non-finite residual and re-solve with
        # reuse off (ocean_jax.opt.driver).
        def cond(state):
            w, r, rnorm, it = state
            not_conv = (rnorm > atol) & (rnorm > rtol * r0norm)
            return not_conv & (it < max_iter)

        if residual_fn32 is not None:
            bc_vals32 = bc_vals.astype(jnp.float32)

            def bc_residual32(w32):
                r32 = residual_fn32(w32)
                return r32.at[bc_dofs].set(w32[bc_dofs] - bc_vals32)

        def body(state):
            w, r, rnorm, it = state
            # exact J(w)·v as the tangent of the BC-aware residual — the
            # assembled operator is jacfwd of the SAME element residuals
            # (fem/assemble.py), so this is the identical linear map
            # without materializing 15-tangent element Jacobians every
            # Newton iteration (was ~45 ms/GD-iteration of dot_generals
            # + a ~2 ms scatter per matvec in the fused-profile trace)
            if residual_fn32 is not None:
                # all-f32 correction sweeps (see docstring): the f64
                # residual below remains the only accuracy-bearing value
                _, jvp32 = jax.linearize(bc_residual32,
                                         w.astype(jnp.float32))
                r32 = r.astype(jnp.float32)
                dw32 = fac0.solve32_raw(-r32)
                for _ in range(correction_iters):
                    dw32 = dw32 + fac0.solve32_raw(-(r32 + jvp32(dw32)))
                dw = dw32.astype(jnp.float64)
            else:
                _, jvp_fn = jax.linearize(bc_residual, w)
                dw = fac0.solve32(-r)
                for _ in range(correction_iters):
                    dw = dw + fac0.solve32(-(r + jvp_fn(dw)))
            w = w + dw
            r = bc_residual(w)
            return (w, r, jnp.linalg.norm(r), it + 1)

        w, r, rnorm, it = jax.lax.while_loop(
            cond, body, (w0, r0, r0norm, jnp.asarray(0)))
        fac = fac0
    else:
        def cond(state):
            w, r, rnorm, it, fac = state
            not_conv = (rnorm > atol) & (rnorm > rtol * r0norm)
            return not_conv & (it < max_iter)

        def body(state):
            w, r, rnorm, it, fac = state
            op = operator_fn(w)
            # refactor() keeps the solver kind (LU factors or explicit
            # inverse) so both cond branches carry one pytree structure
            fac = jax.lax.cond(
                it == 0, lambda: fac,
                lambda: fac.refactor(op.dense()))
            dw = fac.solve32(-r)
            w = w + dw
            r = bc_residual(w)
            return (w, r, jnp.linalg.norm(r), it + 1, fac)

        w, r, rnorm, it, fac = jax.lax.while_loop(
            cond, body, (w0, r0, r0norm, jnp.asarray(0), fac0))
    converged = (rnorm <= atol) | (rnorm <= rtol * r0norm)
    return NewtonResult(w, it, rnorm, converged, fac)
