"""h3-py-compatible facade over cells/h3core — a drop-in for the common
``import h3`` surface so code written against the public h3 Python API
runs unchanged against this engine's vendored implementation::

    from geokitten_spark.cells import h3compat as h3
    h3.latlng_to_cell(37.3615593, -122.0553238, 5)  # '85283473fffffff'

Scalar in, scalar out, lowercase-hex STRING cell ids — the public h3-py
v4 calling convention. Vector workloads should use cells/h3core directly
(numpy arrays end to end); this facade is for API compatibility and
interactive use. Divergences (documented in h3core): cell_to_boundary
omits the interpolated vertex where an edge crosses an icosahedron edge.
grid_disk is exact everywhere, including pentagon distortion (BFS over
derived adjacency in the warp zone; fast geometric path elsewhere).
"""

from __future__ import annotations

import numpy as np

from . import h3core as _c

__all__ = [
    "latlng_to_cell",
    "cell_to_latlng",
    "cell_to_parent",
    "cell_to_children",
    "cell_to_center_child",
    "get_resolution",
    "get_base_cell_number",
    "is_valid_cell",
    "is_pentagon",
    "grid_disk",
    "grid_ring",
    "grid_distance",
    "grid_path_cells",
    "cell_to_boundary",
    "polygon_to_cells",
    "str_to_int",
    "int_to_str",
    "compact_cells",
    "uncompact_cells",
]


def latlng_to_cell(lat: float, lng: float, res: int) -> str:
    return format(int(_c.latlng_to_cell(lat, lng, res)[0]), "x")


def cell_to_latlng(cell: str) -> tuple:
    la, lo = _c.cell_to_latlng(np.uint64(int(cell, 16)))
    return float(la[0]), float(lo[0])


def cell_to_parent(cell: str, res: int) -> str:
    return format(int(_c.cell_to_parent(np.uint64(int(cell, 16)), res)[0]), "x")


def cell_to_children(cell: str, res: int | None = None) -> list:
    out = _c.cell_to_children(np.uint64(int(cell, 16)), res)
    return [format(int(x), "x") for x in out]


def cell_to_center_child(cell: str, res: int) -> str:
    return format(
        int(_c.cell_to_center_child(np.uint64(int(cell, 16)), res)[0]), "x"
    )


def get_resolution(cell: str) -> int:
    return int(_c.get_resolution(np.uint64(int(cell, 16))))


def get_base_cell_number(cell: str) -> int:
    return int(_c.get_base_cell(np.uint64(int(cell, 16))))


def is_valid_cell(cell: str) -> bool:
    try:
        return bool(_c.is_valid_cell(np.uint64(int(cell, 16))))
    except ValueError:
        return False


def is_pentagon(cell: str) -> bool:
    return bool(_c.is_pentagon(np.uint64(int(cell, 16))))


def grid_disk(cell: str, k: int = 1) -> list:
    out = _c.grid_disk(np.uint64(int(cell, 16)), k)
    return [format(int(x), "x") for x in out]


def grid_ring(cell: str, k: int = 1) -> list:
    out = _c.grid_ring(np.uint64(int(cell, 16)), k)
    return [format(int(x), "x") for x in out]


def grid_distance(a: str, b: str) -> int:
    return _c.grid_distance(np.uint64(int(a, 16)), np.uint64(int(b, 16)))


def grid_path_cells(a: str, b: str) -> list:
    out = _c.grid_path_cells(np.uint64(int(a, 16)), np.uint64(int(b, 16)))
    return [format(int(x), "x") for x in out]


def cell_to_boundary(cell: str):
    return [tuple(p) for p in _c.cell_to_boundary(np.uint64(int(cell, 16)))]


def polygon_to_cells(outer, res: int, holes=()) -> list:
    out = _c.polygon_to_cells(outer, res, holes=holes)
    return [format(int(x), "x") for x in out]


def str_to_int(cell: str) -> int:
    return int(cell, 16)


def int_to_str(cell: int) -> str:
    return format(int(cell), "x")


def compact_cells(cells: list) -> list:
    """h3-py v4 compact_cells: minimal mixed-res set covering the same area."""
    arr = np.array([int(c, 16) for c in cells], dtype=np.uint64)
    return [format(int(x), "x") for x in _c.compact_cells(arr)]


def uncompact_cells(cells: list, res: int) -> list:
    """h3-py v4 uncompact_cells: expand every cell to its ``res`` descendants."""
    arr = np.array([int(c, 16) for c in cells], dtype=np.uint64)
    return [format(int(x), "x") for x in _c.uncompact_cells(arr, res)]
