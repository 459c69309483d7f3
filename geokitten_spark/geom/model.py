"""Geometry model: nested-coordinate representation + WKT codec.

Pure numpy/python — no shapely. This is the in-kernel geometry model for the
PySpark engine (SURVEY.md §1.2): a geometry is ``(kind, parts)`` where

* ``kind``   — one of the ``GeomKind`` constants below;
* ``parts``  — for polygonal kinds: ``list[list[np.ndarray]]`` —
  parts → rings (ring 0 = exterior, rest = holes) → ``(n, 2|3)`` float64
  coordinate array (closed: first == last row);
  for ``POINT``: a ``(1, 2|3)`` array (empty point → ``(0, 2)``);
  for empty polygonal geometries: ``[]``.

Semantics mirror the reference's use of shapely types
(``/root/reference/geokitten/gdf_standardization.py:25`` imports Point,
Polygon, MultiPolygon, LinearRing, GeometryCollection) without any GEOS
dependency.  The Spark-side columnar encoding of the same model lives in
``geokitten_spark/functions/geometry_udfs.py``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "GeomKind",
    "Geometry",
    "parse_wkt",
    "to_wkt",
    "polygon",
    "multipolygon",
    "point",
    "empty_point",
]


class GeomKind:
    """Integer geometry-kind tags (stable: used in Spark columns)."""

    POINT = 1
    LINESTRING = 2
    POLYGON = 3
    MULTIPOINT = 4
    MULTILINESTRING = 5
    MULTIPOLYGON = 6
    GEOMETRYCOLLECTION = 7
    LINEARRING = 8

    NAMES = {
        POINT: "POINT",
        LINESTRING: "LINESTRING",
        POLYGON: "POLYGON",
        MULTIPOINT: "MULTIPOINT",
        MULTILINESTRING: "MULTILINESTRING",
        MULTIPOLYGON: "MULTIPOLYGON",
        GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
        LINEARRING: "LINEARRING",
    }


@dataclass
class Geometry:
    """A parsed geometry.

    ``parts`` layout depends on ``kind``:
      * POINT: ``coords`` holds a (0|1, 2|3) array; ``parts`` unused.
      * LINESTRING / LINEARRING: ``coords`` holds an (n, 2|3) array.
      * POLYGON: ``parts == [rings]`` with a single part.
      * MULTIPOLYGON: one entry per polygon part.
      * GEOMETRYCOLLECTION: ``members`` holds child Geometry objects.
    """

    kind: int
    parts: list = field(default_factory=list)  # list[list[np.ndarray]]
    coords: np.ndarray | None = None  # for POINT / LINESTRING / LINEARRING
    members: list = field(default_factory=list)  # for GEOMETRYCOLLECTION

    # ---- predicates -------------------------------------------------
    @property
    def is_empty(self) -> bool:
        if self.kind == GeomKind.GEOMETRYCOLLECTION:
            return len(self.members) == 0
        if self.kind in (GeomKind.POINT, GeomKind.LINESTRING, GeomKind.LINEARRING):
            return self.coords is None or len(self.coords) == 0
        return len(self.parts) == 0

    @property
    def is_polygonal(self) -> bool:
        return self.kind in (GeomKind.POLYGON, GeomKind.MULTIPOLYGON)

    # ---- accessors --------------------------------------------------
    def polygons(self) -> list:
        """Rings per polygon part: ``[[ext, hole, ...], ...]``."""
        if self.kind == GeomKind.POLYGON:
            return self.parts
        if self.kind == GeomKind.MULTIPOLYGON:
            return self.parts
        raise TypeError(f"not polygonal: {GeomKind.NAMES.get(self.kind)}")

    def bbox(self) -> tuple:
        """(xmin, ymin, xmax, ymax); NaNs for empty."""
        arrs = []
        if self.coords is not None and len(self.coords):
            arrs.append(self.coords[:, :2])
        for rings in self.parts:
            for r in rings:
                if len(r):
                    arrs.append(np.asarray(r)[:, :2])
        for m in self.members:
            b = m.bbox()
            if not np.isnan(b[0]):
                arrs.append(np.array([[b[0], b[1]], [b[2], b[3]]]))
        if not arrs:
            return (np.nan, np.nan, np.nan, np.nan)
        allc = np.vstack(arrs)
        return (
            float(allc[:, 0].min()),
            float(allc[:, 1].min()),
            float(allc[:, 0].max()),
            float(allc[:, 1].max()),
        )

    def __eq__(self, other) -> bool:  # structural equality (exact coords)
        if not isinstance(other, Geometry):
            return NotImplemented
        return to_wkt(self) == to_wkt(other)


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------

def point(x: float, y: float, *rest) -> Geometry:
    return Geometry(GeomKind.POINT, coords=np.array([[x, y, *rest]], dtype=np.float64))


def empty_point() -> Geometry:
    return Geometry(GeomKind.POINT, coords=np.empty((0, 2), dtype=np.float64))


def _close(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, dtype=np.float64)
    if len(arr) and not np.array_equal(arr[0], arr[-1]):
        arr = np.vstack([arr, arr[:1]])
    return arr


def polygon(exterior, holes=()) -> Geometry:
    rings = [_close(exterior)] + [_close(h) for h in holes]
    return Geometry(GeomKind.POLYGON, parts=[rings])


def multipolygon(polys) -> Geometry:
    """polys: iterable of ring-lists or of POLYGON Geometry."""
    parts = []
    for p in polys:
        if isinstance(p, Geometry):
            parts.extend(p.parts)
        else:
            parts.append([_close(r) for r in p])
    return Geometry(GeomKind.MULTIPOLYGON, parts=parts)


# ---------------------------------------------------------------------------
# WKT codec
# ---------------------------------------------------------------------------

_WKT_HEAD = re.compile(r"\s*([A-Za-z]+)\s*(Z|M|ZM)?\s*(EMPTY|\()", re.IGNORECASE)


def _parse_coord_seq(body: str) -> np.ndarray:
    pts = []
    for tok in body.split(","):
        vals = [float(v) for v in tok.split()]
        pts.append(vals)
    width = max(len(p) for p in pts)
    out = np.zeros((len(pts), width), dtype=np.float64)
    for i, p in enumerate(pts):
        out[i, : len(p)] = p
    return out


def _split_level(s: str) -> list:
    """Split a parenthesized group body on top-level commas."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return out


def _strip_parens(s: str) -> str:
    s = s.strip()
    assert s.startswith("(") and s.endswith(")"), f"bad WKT group: {s[:40]}"
    return s[1:-1]


def parse_wkt(wkt: str) -> Geometry:
    """Parse WKT (2-D or Z) into a Geometry. Supports POINT, LINESTRING,
    LINEARRING, POLYGON, MULTIPOLYGON, GEOMETRYCOLLECTION, EMPTY variants."""
    m = _WKT_HEAD.match(wkt)
    if not m:
        raise ValueError(f"unparseable WKT: {wkt[:60]!r}")
    name = m.group(1).upper()
    kind = {v: k for k, v in GeomKind.NAMES.items()}[name]
    rest = wkt[m.end() - 1 :].strip()  # includes '(' or is 'EMPTY'
    if rest.upper().startswith("EMPTY") or wkt.strip().upper().endswith("EMPTY"):
        if kind == GeomKind.POINT:
            return empty_point()
        if kind in (GeomKind.LINESTRING, GeomKind.LINEARRING):
            return Geometry(kind, coords=np.empty((0, 2), dtype=np.float64))
        if kind == GeomKind.GEOMETRYCOLLECTION:
            return Geometry(kind)
        return Geometry(kind)

    body = _strip_parens(rest)
    if kind == GeomKind.POINT:
        return Geometry(kind, coords=_parse_coord_seq(body))
    if kind in (GeomKind.LINESTRING, GeomKind.LINEARRING):
        return Geometry(kind, coords=_parse_coord_seq(body))
    if kind == GeomKind.POLYGON:
        rings = [_parse_coord_seq(_strip_parens(r)) for r in _split_level(body)]
        return Geometry(kind, parts=[rings])
    if kind == GeomKind.MULTIPOLYGON:
        parts = []
        for poly in _split_level(body):
            pb = _strip_parens(poly)
            rings = [_parse_coord_seq(_strip_parens(r)) for r in _split_level(pb)]
            parts.append(rings)
        return Geometry(kind, parts=parts)
    if kind == GeomKind.GEOMETRYCOLLECTION:
        members = [parse_wkt(g.strip()) for g in _split_level(body)]
        return Geometry(kind, members=members)
    raise ValueError(f"unsupported WKT type: {name}")


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coords(arr: np.ndarray) -> str:
    return ", ".join(" ".join(_fmt_num(v) for v in row) for row in np.asarray(arr))


def to_wkt(g: Geometry) -> str:
    name = GeomKind.NAMES[g.kind]
    if g.is_empty:
        return f"{name} EMPTY"
    if g.kind == GeomKind.POINT:
        return f"POINT ({_fmt_coords(g.coords)})"
    if g.kind in (GeomKind.LINESTRING, GeomKind.LINEARRING):
        return f"{name} ({_fmt_coords(g.coords)})"
    if g.kind == GeomKind.POLYGON:
        rings = ", ".join(f"({_fmt_coords(r)})" for r in g.parts[0])
        return f"POLYGON ({rings})"
    if g.kind == GeomKind.MULTIPOLYGON:
        parts = ", ".join(
            "(" + ", ".join(f"({_fmt_coords(r)})" for r in rings) + ")"
            for rings in g.parts
        )
        return f"MULTIPOLYGON ({parts})"
    if g.kind == GeomKind.GEOMETRYCOLLECTION:
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(m) for m in g.members) + ")"
    raise ValueError(f"unsupported kind {g.kind}")
