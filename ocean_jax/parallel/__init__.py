from .sharding import (make_buoy_mesh, make_2d_mesh, make_sharded_step,
                       make_sharded_step_2d, pad_buoys)
from .dof_sharding import make_sharded_matvec

__all__ = ["make_buoy_mesh", "make_2d_mesh", "make_sharded_step",
           "make_sharded_step_2d", "pad_buoys", "make_sharded_matvec"]
