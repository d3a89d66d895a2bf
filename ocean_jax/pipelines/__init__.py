from . import (stokes_gradcheck, ud_construction, ocp, limits,
               initial_control, ns_gradcheck)

__all__ = ["stokes_gradcheck", "ud_construction", "ocp", "limits",
           "initial_control", "ns_gradcheck"]
