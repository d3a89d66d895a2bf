"""Host-driven continuation ladder (staged rung programs + warm starts)
== the in-program ν-continuation solve.

The staged runner splits the viscosity-continuation ladder into one
traced-ν rung program executed from the host (a single all-rungs begin
program is a minutes-long device burst that reproducibly crashed the
tunneled TPU worker at Nx=64 ν=0.01), and warm-starts Armijo probes from
the accepted state instead of re-running the ladder. Both must land on
the same Newton solution: the ladder/warm start only choose the initial
guess; the exact-f64 convergence test fixes the answer."""

import jax.numpy as jnp
import numpy as np

from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod


def _mg_problem(nu=0.05, n_rungs=4):
    rng = np.random.default_rng(0)
    K = 4
    cfg = OCPConfig(unit_square_resolution=16, ud_experiment=f"{K}_buoys",
                    T=0.05, dt=0.005, linear_solver="mg", viscosity=nu,
                    newton_continuation=n_rungs)
    seeds = 0.4 + 1.2 * rng.random((K, 2))
    u_d = 0.05 * rng.standard_normal((K, cfg.num_time_steps, 2))
    return cfg, sys_mod.build_problem(cfg, u_d=u_d, x0=seeds)


def test_host_ladder_matches_inprogram_continuation():
    cfg, prob = _mg_problem()
    f = sys_mod.initial_control(prob, case=4)

    # in-program ladder (fused _solve_ns path)
    ref = sys_mod.solve_ns(prob, f.quad)
    assert bool(ref.converged)

    # host ladder: one traced-nu rung program, executed per rung
    progs = sys_mod.make_staged_pair(prob)
    assert progs.rung is not None
    n = cfg.newton_continuation
    ratio = (prob.nu / 1.0) ** (1.0 / (n + 1))
    w = jnp.zeros(prob.space.ndof)
    for k in range(n + 1):
        w = progs.rung(f.quad, w, jnp.asarray(ratio ** k))
    fwd, j_warm = progs.begin_warm(f.quad, w)
    assert bool(fwd.newton.converged)
    scale = float(jnp.abs(ref.w).max())
    assert scale > 0.0          # nonzero flow exercised
    assert float(jnp.abs(fwd.w - ref.w).max()) < 1e-8 * scale

    # cold begin (in-program ladder) agrees too
    fwd_c, j_cold = progs.begin(f.quad)
    assert abs(float(j_warm) - float(j_cold)) < 1e-9 * (
        abs(float(j_cold)) + 1.0)


def test_warm_probe_matches_cold_probe():
    cfg, prob = _mg_problem()
    f = sys_mod.initial_control(prob, case=4)
    progs = sys_mod.make_staged_pair(prob)
    fwd, j0 = progs.begin(f.quad)
    _, g, gradj, _, adj_ok = progs.grad(f, fwd)
    assert bool(adj_ok)
    lr = jnp.asarray(1.0)
    f_a, fwd_a, j_a = progs.probe(f, g, lr)            # cold + ladder
    f_b, fwd_b, j_b = progs.probe_warm(f, g, lr, fwd.w)  # warm, no ladder
    assert bool(fwd_b.newton.converged)
    assert float(jnp.abs(f_a.quad - f_b.quad).max()) == 0.0
    assert abs(float(j_a) - float(j_b)) < 1e-9 * (abs(float(j_a)) + 1.0)


def test_stepped_newton_matches_inprogram():
    """Host-driven one-step-per-program Newton (make_newton_stager) ==
    the in-program newton_solve_mg: same frozen preconditioner, same
    damping, same convergence/polish schedule."""
    cfg, prob = _mg_problem(nu=1.0, n_rungs=0)
    f = sys_mod.initial_control(prob, case=4)
    ref = sys_mod.solve_ns(prob, f.quad)
    stager = sys_mod.make_newton_stager(prob)
    w, it, rn, conv = sys_mod.run_newton_staged(
        stager, f.quad, jnp.zeros(prob.space.ndof), prob.nu)
    assert conv
    scale = float(jnp.abs(ref.w).max())
    assert scale > 0.0
    assert float(jnp.abs(w - ref.w).max()) < 1e-9 * scale
    assert it == int(ref.iterations)

    fwd, j = stager.finish(f.quad, w, jnp.asarray(it), jnp.asarray(rn),
                           jnp.asarray(conv))
    fwd_ref = sys_mod.forward(prob, f.quad)
    jref = sys_mod.cost(prob, fwd_ref.u_values, f.quad)
    assert abs(float(j) - float(jref)) < 1e-10 * (abs(float(jref)) + 1.0)


def test_stepped_newton_ladder_nu005():
    """Stepped ladder at nu=0.05 lands on the in-program continuation
    solution."""
    cfg, prob = _mg_problem()
    f = sys_mod.initial_control(prob, case=4)
    ref = sys_mod.solve_ns(prob, f.quad)
    stager = sys_mod.make_newton_stager(prob)
    n = cfg.newton_continuation
    ratio = (prob.nu / 1.0) ** (1.0 / (n + 1))
    w = jnp.zeros(prob.space.ndof)
    for k in range(n + 1):
        w, _, _, _ = sys_mod.run_newton_staged(
            stager, f.quad, w, ratio ** k,
            nu_scale=ratio ** k / prob.nu)
    w, it, rn, conv = sys_mod.run_newton_staged(stager, f.quad, w, prob.nu)
    assert conv
    scale = float(jnp.abs(ref.w).max())
    assert float(jnp.abs(w - ref.w).max()) < 1e-8 * scale
