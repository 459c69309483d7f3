"""Cell index layer: S2 (spec-faithful), square grid (SQL-oracle-able),
axial hex grid (kRing semantics) — SURVEY.md §7 step 4."""

from . import s2
from .grid import grid_cell, grid_cell_sql, grid_decode, grid_kring
from .hexgrid import hex_cell, hex_decode, hex_kring, hex_center

__all__ = [
    "s2",
    "grid_cell",
    "grid_cell_sql",
    "grid_decode",
    "grid_kring",
    "hex_cell",
    "hex_decode",
    "hex_kring",
    "hex_center",
]
