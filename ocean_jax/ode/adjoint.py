"""Adjoint buoy ODE: backward recursion for the costate μ.

Replaces the reference's hot loop #2 (``OCP_dolfin.py:234-252``):

    μ[nt-1] = 0
    μ[k] = μ[k+1] − h ∇u(x[k+1])ᵀ ((u(x[k+1]) − u_d[k+1]) − μ[k+1]),
    k = nt-2 … 0

with a reversed ``lax.scan`` vmapped over buoys. ∇u is the P1-projected
gradient field evaluated at trajectory points (``OCP_dolfin.py:243-245``);
if a point is outside the domain the previous ∇u matrix is reused, exactly
the reference's leftover-variable quirk (``:242-249``; initialized to zeros
— unreachable for unmasked buoys, whose trajectories stay inside).
Masked (escaped) buoys are skipped → μ ≡ 0 (``:237-238``).

Also provides the *implicit* variant used by the coupled NS+ODE gradient
check (``fenics_testing_pipelines/dolfin_implementation.py:107-117``):

    (I + h ∇uᵀ) μ[k] = μ[k+1] − h ∇uᵀ (u(x[k+1]) − u_d[k])

(note the u_d time index k, not k+1 — reproduced as-is), and the gen-1
dolfinx variant (``old_dolfinx_files/solver_classes/ODE_solver.py:123-151``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fem.spaces import TaylorHoodSpace
from ..fem.interpolate import eval_p1_tensor


def solve_adjoint_ode(space: TaylorHoodSpace, grad_u: jnp.ndarray,
                      x: jnp.ndarray, u_values: jnp.ndarray,
                      u_d: jnp.ndarray, mask: jnp.ndarray,
                      h: float, method: str = "parallel",
                      grid=None) -> jnp.ndarray:
    """Explicit backward recursion (the production pipelines).

    grad_u: (n_p1, 2, 2) projected ∇u; x, u_values, u_d: (K, nt, 2);
    mask: (K,) bool. Returns μ: (K, nt, 2).

    method="parallel" (default): the recursion is LINEAR in μ —
    μ[k] = (I + h Gᵀ_k) μ[k+1] − h Gᵀ_k r_k — so it runs as a parallel
    prefix (``lax.associative_scan``) over the time axis: O(log nt) depth
    instead of 200 sequential steps, with all ∇u evaluations done in one
    batched gather. Produces the same values as the sequential scan
    (method="scan") to rounding error; tested equal.

    ``grid`` (a ``GridEval``): route the batched ∇u evaluation through
    the fused Pallas kernel (``ode/pallas_eval.py``) — the dominant cost
    of the adjoint stage at K=10⁴; matches the gather path to ~1e-12.
    """
    if method == "parallel":
        return _adjoint_ode_parallel(space, grad_u, x, u_values, u_d,
                                     mask, h, grid=grid)
    nt = x.shape[1]

    def one_buoy(x_b, uv_b, ud_b, masked):
        def step(carry, k):
            mu_next, g_prev = carry
            g, inside = eval_p1_tensor(space, grad_u, x_b[k + 1])
            g = jnp.where(inside, g, g_prev)
            mu_k = mu_next - h * g.T @ ((uv_b[k + 1] - ud_b[k + 1])
                                        - mu_next)
            return (mu_k, g), mu_k

        # derive carry init from the (device-varying) buoy data so the
        # scan carry types match under shard_map
        zero_b = x_b[0, 0] * 0.0
        init = (jnp.zeros(2) + zero_b, jnp.zeros((2, 2)) + zero_b)
        _, mus = jax.lax.scan(step, init,
                              jnp.arange(nt - 2, -1, -1, dtype=jnp.int32))
        mu = jnp.concatenate([mus[::-1], jnp.zeros((1, 2))])   # (nt, 2)
        return jnp.where(masked, jnp.zeros_like(mu), mu)

    return jax.vmap(one_buoy)(x, u_values, u_d, mask)


def solve_adjoint_ode_consistent(space: TaylorHoodSpace,
                                 grad_u: jnp.ndarray, x_raw: jnp.ndarray,
                                 u_values: jnp.ndarray, u_d: jnp.ndarray,
                                 mask: jnp.ndarray, kfail: jnp.ndarray,
                                 h: float, grid=None) -> jnp.ndarray:
    """Consistent-mode μ: escaped buoys keep their PRE-escape adjoint
    contributions (a capability beyond the reference, BACKLOG item 0).

    The reference drops escaped buoys from the adjoint entirely
    (``OCP_dolfin.py:237-238``) even though their pre-escape velocities
    still enter J — its gradient systematically under-counts in escape
    regimes (demonstrated 2× off in results/gradcheck_10_buoys/). Here the
    μ recursion runs over each escaped buoy's valid window t ≤ kfail−1
    (real positions/velocities) and is zero beyond it; unmasked buoys are
    bit-identical to the reference recursion."""
    K, nt, _ = x_raw.shape
    t = jnp.arange(nt)[None, :]
    valid = (~mask[:, None]) | (t <= (kfail[:, None] - 1))
    return _adjoint_ode_parallel(space, grad_u, x_raw, u_values, u_d,
                                 jnp.zeros_like(mask), h, valid=valid,
                                 grid=grid)


def _adjoint_ode_parallel(space: TaylorHoodSpace, grad_u: jnp.ndarray,
                          x: jnp.ndarray, u_values: jnp.ndarray,
                          u_d: jnp.ndarray, mask: jnp.ndarray,
                          h: float, valid: jnp.ndarray = None,
                          grid=None) -> jnp.ndarray:
    """Parallel-prefix form of the backward μ recursion.

    μ[k] = A_k μ[k+1] + b_k,  A_k = I + h ∇u(x[k+1])ᵀ,
                              b_k = −h ∇u(x[k+1])ᵀ (u[k+1] − u_d[k+1]).
    Affine-map composition is associative → lax.associative_scan over the
    (reversed) time axis, vectorized over all buoys. The reference's
    reuse-previous-∇u-on-failure quirk (``OCP_dolfin.py:242-249``) is
    reproduced with a next-valid-index fill (reverse cummin).
    """
    K, nt, _ = x.shape

    # batched ∇u at ALL trajectory points — the adjoint stage's dominant
    # cost at K=10⁴; the fused Pallas eval kernel replaces the gather
    # chain when a GridEval is supplied (ode_backend="pallas")
    if grid is not None:
        from .grideval import grad_to_grid
        from .pallas_eval import eval_p1_tensor_pallas
        g_img = grad_to_grid(grid, grad_u)
        g_all, inside = eval_p1_tensor_pallas(grid, g_img, x)
    else:
        g_all, inside = eval_p1_tensor(space, grad_u, x)  # (K, nt, 2, 2)
    # Next-valid-∇u fill (the reference's reuse-previous quirk): instead
    # of computing gather indices and a per-lane take_along_axis — the
    # gathers on (10⁴, 200) f64 planes lowered to 8 × 19.4 ms fusions,
    # HALF the fused iteration's device time (round-4 profile) — run a
    # log-depth LAST-VALID-VALUE fill over reversed time: each segment
    # carries (last valid g components, any-valid), an associative
    # semigroup, so ``lax.associative_scan`` gives out[t] = g at the
    # smallest valid time ≥ t in 8 levels of elementwise selects. Selects
    # pick the same elements as the gathers did → bit-identical results.
    #
    # All work below stays on (K, nt)-shaped COMPONENT PLANES: where-ing /
    # composing (…, 2, 2)-shaped arrays pads the tiny trailing dims to
    # full TPU tiles (the component split runs lane-parallel over the big
    # axes). Same reasoning as the six-plane scan elements below (a
    # (…, 2, 2) scan OOMed at K=10⁴).
    comp_planes = tuple(jnp.flip(g_all[..., i, j], axis=1)
                        for i in range(2) for j in range(2))
    inside_rev = jnp.flip(inside, axis=1)

    def fill_combine(left, right):
        rh = right[4]
        return tuple(jnp.where(rh, right[i], left[i]) for i in range(4)) \
            + (left[4] | rh,)

    filled = jax.lax.associative_scan(
        fill_combine, comp_planes + (inside_rev,), axis=1)
    has_valid = jnp.flip(filled[4], axis=1)                # (K, nt)
    g_filled = {(i, j): jnp.flip(filled[2 * i + j], axis=1)
                for i in range(2) for j in range(2)}

    def used(i, j):                                        # (K, nt)
        return jnp.where(has_valid, g_filled[(i, j)], 0.0)

    # elements for steps k = nt-2 .. 0, using time index t = k+1;
    # gt_ij = (∇u)ᵀ_ij = g_ji, zeroed outside the valid window
    # (consistent mode: steps outside become the identity map A=I, b=0,
    # so μ is zero past the window and exact inside it)
    vmask = None if valid is None else valid[:, 1:]

    def gt_comp(i, j):                                     # (K, nt-1)
        c = used(j, i)[:, 1:]
        return c if vmask is None else jnp.where(vmask, c, 0.0)

    gt00, gt01 = gt_comp(0, 0), gt_comp(0, 1)
    gt10, gt11 = gt_comp(1, 0), gt_comp(1, 1)
    r1 = u_values[:, 1:, 0] - u_d[:, 1:, 0]                # (K, nt-1)
    r2 = u_values[:, 1:, 1] - u_d[:, 1:, 1]
    if vmask is not None:
        r1 = jnp.where(vmask, r1, 0.0)
        r2 = jnp.where(vmask, r2, 0.0)
    # A = I + h ∇uᵀ ; b = −h ∇uᵀ (u − u_d), expanded per component with
    # the same contraction order as the einsum it replaces
    a11, a12 = 1.0 + h * gt00, h * gt01
    a21, a22 = h * gt10, 1.0 + h * gt11
    b1 = -h * (gt00 * r1 + gt01 * r2)
    b2 = -h * (gt10 * r1 + gt11 * r2)

    def comp(arr):
        # (K, nt-1) → reversed-time (nt-1, K): the big K axis rides the
        # TPU lane dimension through the scan
        return jnp.flip(arr, axis=1).swapaxes(0, 1)

    elems = (comp(a11), comp(a12), comp(a21), comp(a22),
             comp(b1), comp(b2))

    def combine(left, right):
        la11, la12, la21, la22, lb1, lb2 = left
        ra11, ra12, ra21, ra22, rb1, rb2 = right
        # A = A_r @ A_l ; b = A_r @ b_l + b_r
        return (ra11 * la11 + ra12 * la21,
                ra11 * la12 + ra12 * la22,
                ra21 * la11 + ra22 * la21,
                ra21 * la12 + ra22 * la22,
                ra11 * lb1 + ra12 * lb2 + rb1,
                ra21 * lb1 + ra22 * lb2 + rb2)

    out = jax.lax.associative_scan(combine, elems)
    mu1 = jnp.flip(out[4].swapaxes(0, 1), axis=1)          # (K, nt-1)
    mu2 = jnp.flip(out[5].swapaxes(0, 1), axis=1)
    mu = jnp.stack([mu1, mu2], axis=-1)                    # (K, nt-1, 2)
    mu = jnp.concatenate([mu, jnp.zeros((K, 1, 2))], axis=1)
    return jnp.where(mask[:, None, None], 0.0, mu)


def solve_adjoint_ode_implicit(space: TaylorHoodSpace, grad_u: jnp.ndarray,
                               u: jnp.ndarray, x: jnp.ndarray,
                               u_d: jnp.ndarray, h: float,
                               ud_index: str = "k") -> jnp.ndarray:
    """Implicit backward recursion (C5 gradient-check harness / gen-1).

    Solves the 2×2 system (I + h ∇uᵀ) μ[k] = μ[k+1] − h ∇uᵀ (u(x[k+1]) −
    u_d[idx]) in closed form. ``ud_index``: "k" reproduces
    ``dolfin_implementation.py:114``; "k+1" is the consistent variant.
    """
    from ..fem.interpolate import eval_velocity
    nt = x.shape[1]
    shift = 0 if ud_index == "k" else 1

    def one_buoy(x_b, ud_b):
        def step(mu_next, k):
            g, _ = eval_p1_tensor(space, grad_u, x_b[k + 1])
            uv, _ = eval_velocity(space, u, x_b[k + 1])
            a = jnp.eye(2) + h * g.T
            b = mu_next - h * g.T @ (uv - ud_b[k + shift])
            det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
            inv = jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]]) / det
            mu_k = inv @ b
            return mu_k, mu_k

        _, mus = jax.lax.scan(step, jnp.zeros(2),
                              jnp.arange(nt - 2, -1, -1, dtype=jnp.int32))
        return jnp.concatenate([mus[::-1], jnp.zeros((1, 2))])

    return jax.vmap(one_buoy)(x, u_d)
