"""Expression library: geocode (pure SQL), text (SQL + one pandas UDF),
geometry kernels (pandas UDFs), cell encodes (pandas UDFs + pure-SQL grid)."""

from . import geocode, text, geometry_udfs, cells_udfs

__all__ = ["geocode", "text", "geometry_udfs", "cells_udfs"]
