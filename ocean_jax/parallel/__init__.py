from .sharding import make_buoy_mesh, make_sharded_step, pad_buoys

__all__ = ["make_buoy_mesh", "make_sharded_step", "pad_buoys"]
