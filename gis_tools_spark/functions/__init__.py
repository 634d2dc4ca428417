"""Column-level geometry/geodesy functions."""

from .geom_funcs import (  # noqa: F401
    geom_area,
    geom_bounds_struct,
    geom_buffer,
    geom_centroid_xy,
    geom_convex_hull,
    geom_envelope,
    geom_force_2d,
    geom_length,
    geom_segmentize,
    geom_shape_factor,
    geom_simplify,
    geom_type_of,
)
from .geodesy import great_circle_meters, euclidean  # noqa: F401
