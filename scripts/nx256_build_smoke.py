import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from ocean_jax.config import OCPConfig
from ocean_jax import system as sys_mod

t0 = time.time()
cfg = OCPConfig(ud_experiment="400_buoys", unit_square_resolution=256,
                use_line_search=False, num_steps=1, linear_solver="mg")
prob = sys_mod.build_problem(cfg)
depth, c = 1, prob.mg
sizes = []
while True:
    sizes.append(c.space_c.ndof)
    if c.sub is None:
        break
    depth, c = depth + 1, c.sub
print(f"built Nx=256: ndof={prob.space.ndof} levels={depth+1} "
      f"coarse_sizes={sizes} leaf_inv_n={c.ainv_c.shape[0]} "
      f"stencil={prob.mg.st_mixed is not None} "
      f"({time.time()-t0:.0f}s)", flush=True)
# one residual + one stencil matvec at the fine level for memory sanity
import jax.numpy as jnp
from ocean_jax.fem import assemble
f = sys_mod.initial_control(prob, case=4)
op = jax.jit(lambda w: assemble.ns_operator(
    prob.space, prob.bq, w, prob.nu, prob.bc_dofs))(jnp.zeros(prob.space.ndof))
from ocean_jax.ops import stencil as st_mod
mv = st_mod.matvec_of(prob.mg.st_mixed, jnp.float32)(op)
x = jnp.ones(prob.space.ndof)
y = mv(x)
print("stencil matvec at 256 ok:", float(jnp.abs(y).max()), flush=True)
