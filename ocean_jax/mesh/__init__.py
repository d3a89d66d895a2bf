from .structured import (
    pipe_mesh,
    Mesh2D,
    rectangle_mesh,
    unit_square_mesh,
    l_shape_mesh,
    mark_boundary_facets,
)
from .locate import locate_points

__all__ = [
    "Mesh2D",
    "rectangle_mesh",
    "unit_square_mesh",
    "l_shape_mesh",
    "pipe_mesh",
    "mark_boundary_facets",
    "locate_points",
]
