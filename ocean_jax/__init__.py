"""ocean_jax — TPU-native framework for optimal control of a coupled
Navier–Stokes / ODE system for reconstruction of ocean currents.

A ground-up JAX/XLA re-design (NOT a port) of the capabilities of the
reference FEniCS/dolfin implementation
(AlexandroJedaidi/Optimal-control-of-a-coupled-Navier-Stokes-ODE-system-
for-reconstruction-of-ocean-currents):

* structured Taylor–Hood (P2/P1) finite elements on rectangle-union
  domains, assembled as batched element kernels (gather → dense element
  compute → scatter-add), replacing dolfin/UFL/FFC
  (reference: ``OCP_dolfin.py:78-140,314-371``),
* Newton solves of stationary incompressible Navier–Stokes with a
  mixed-precision (fp32 LU factorization + fp64 iterative refinement)
  dense saddle-point solver, replacing PETSc LU
  (reference: ``OCP_dolfin.py:325,371``),
* vmapped/scanned buoy-advection ODEs and their adjoints with O(1)
  structured point location, replacing per-point Python→C++ crossings
  (reference: ``OCP_dolfin.py:201-252``),
* adjoint-PDE point sources as batched scatter-adds, replacing
  ``dolfin.PointSource`` (reference: ``OCP_dolfin.py:353-366``),
* reduced-gradient descent with Armijo line search, FD gradient
  verification, and the full artifact/IO surface of the reference
  pipelines (reference: ``OCP_dolfin.py:309-588``),
* multi-chip scaling of the buoy ensemble via ``jax.sharding`` /
  ``shard_map`` (replacing the abandoned MPI generation).

Precision: the package enables float64 globally (dolfin parity); the hot
dense factorizations run in float32 on the MXU with float64 residual
refinement — see ``ocean_jax.ops.linalg``.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from . import mesh, fem, ops, solve, ode, adjoint, opt, io, parallel, pipelines  # noqa: E402,F401
from .config import OCPConfig, load_parameters  # noqa: E402,F401
