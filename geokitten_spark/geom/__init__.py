"""Pure-numpy geometry core (no shapely/GEOS) — SURVEY.md §7 step 1-2."""

from .model import Geometry, GeomKind, parse_wkt, to_wkt, polygon, multipolygon, point, empty_point
from .kernels import (
    drop_z,
    remove_holes,
    standardize_geometry,
    geometry_area,
    mercator_area,
    centroid,
    interior_point,
    point_in_polygon,
    points_in_rings,
    repair_bowtie,
    intersects,
    difference,
    transform_geometry,
)
from .mercator import transform_xy, normalize_crs
from .rtree import STRtree

__all__ = [
    "Geometry", "GeomKind", "parse_wkt", "to_wkt", "polygon", "multipolygon",
    "point", "empty_point", "drop_z", "remove_holes", "standardize_geometry",
    "geometry_area", "mercator_area", "centroid", "interior_point",
    "point_in_polygon", "points_in_rings", "repair_bowtie", "intersects",
    "difference", "transform_geometry", "transform_xy", "normalize_crs", "STRtree",
]
