from .sharding import make_buoy_mesh, make_sharded_step, pad_buoys
from .dof_sharding import make_sharded_matvec

__all__ = ["make_buoy_mesh", "make_sharded_step", "pad_buoys",
           "make_sharded_matvec"]
