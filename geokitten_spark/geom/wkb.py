"""WKB (Well-Known Binary) codec for the geometry model.

Pure stdlib-struct + numpy — the binary twin of ``model.py``'s WKT codec
and the interchange layer for the GeoParquet source/sink
(``sources/geoparquet.py``).  The reference exchanges geometries as
shapely objects inside GeoDataFrames (``gdf_standardization.py``); at
Spark scale the same role is played by WKB blobs in columnar files, so
this codec is the scale path for geometry I/O.

Write side: ISO WKB, little-endian, 2-D or Z (three doubles per
coordinate when the geometry carries a third dimension) — byte-stable
across platforms, so file hashes are reproducible.

Parse side accepts what web data actually contains:

* both byte orders (per-geometry, including mixed orders in nested
  members, which the spec allows);
* ISO 2-D / Z / M / ZM type codes (``base + 1000/2000/3000``) — Z is
  kept, M is read and dropped (the model is 2-D/Z, mirroring the
  reference's Z handling in ``gdf_standardization.py``);
* EWKB (PostGIS) flag bits: ``0x8000_0000`` Z, ``0x4000_0000`` M,
  ``0x2000_0000`` SRID (the 4-byte SRID is read and dropped — CRS
  normalization is `geom/mercator.py`'s job, not the codec's).

Supported kinds mirror the WKT codec: POINT, LINESTRING, POLYGON,
MULTIPOLYGON, GEOMETRYCOLLECTION (plus MULTIPOINT / MULTILINESTRING on
parse, widened to the collection kinds the model stores).  WKB has no
LINEARRING type; rings serialize as LINESTRING.
"""

from __future__ import annotations

import struct

import numpy as np

from geokitten_spark.geom.model import Geometry, GeomKind, empty_point

__all__ = ["to_wkb", "parse_wkb", "wkb_kind"]

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000

# WKB integer codes <-> model kinds (identical numbering by design)
_WKB_CODES = {
    GeomKind.POINT,
    GeomKind.LINESTRING,
    GeomKind.POLYGON,
    GeomKind.MULTIPOINT,
    GeomKind.MULTILINESTRING,
    GeomKind.MULTIPOLYGON,
    GeomKind.GEOMETRYCOLLECTION,
}


# --------------------------------------------------------------------------
# write
# --------------------------------------------------------------------------

def _coords_dim(arr: np.ndarray | None) -> int:
    if arr is None or arr.size == 0:
        return 2
    return int(arr.shape[1])


def _geom_dim(g: Geometry) -> int:
    if g.kind == GeomKind.GEOMETRYCOLLECTION:
        return max((_geom_dim(m) for m in g.members), default=2)
    if g.kind in (GeomKind.POLYGON, GeomKind.MULTIPOLYGON):
        for rings in g.parts:
            for r in rings:
                return _coords_dim(np.asarray(r))
        return 2
    return _coords_dim(g.coords if g.coords is None else np.asarray(g.coords))


def _pack_coords(arr: np.ndarray, dim: int) -> bytes:
    arr = np.asarray(arr, dtype="<f8")
    if arr.shape[1] < dim:  # promote 2-D ring inside a Z geometry: z = 0
        arr = np.pad(arr, ((0, 0), (0, dim - arr.shape[1])))
    return arr[:, :dim].tobytes()


def _pack_linear_ring(arr: np.ndarray, dim: int) -> bytes:
    arr = np.asarray(arr)
    return struct.pack("<I", arr.shape[0]) + _pack_coords(arr, dim)


def to_wkb(g: Geometry) -> bytes:
    """Geometry -> ISO WKB bytes (little-endian, Z iff the geometry has a
    third dimension). Deterministic: same geometry -> same bytes."""
    dim = _geom_dim(g)
    return _to_wkb(g, dim)


def _to_wkb(g: Geometry, dim: int) -> bytes:
    code = g.kind + (1000 if dim == 3 else 0)
    head = b"\x01" + struct.pack("<I", code)
    if g.kind == GeomKind.POINT:
        if g.is_empty:
            # ISO empty point: NaN coordinates
            return head + struct.pack("<%dd" % dim, *([float("nan")] * dim))
        return head + _pack_coords(np.asarray(g.coords), dim)
    if g.kind in (GeomKind.LINESTRING, GeomKind.LINEARRING):
        arr = np.asarray(g.coords if g.coords is not None else np.empty((0, 2)))
        head = b"\x01" + struct.pack("<I", GeomKind.LINESTRING + (1000 if dim == 3 else 0))
        return head + _pack_linear_ring(arr, dim)
    if g.kind == GeomKind.POLYGON:
        rings = g.parts[0] if g.parts else []
        body = struct.pack("<I", len(rings))
        for r in rings:
            body += _pack_linear_ring(r, dim)
        return head + body
    if g.kind == GeomKind.MULTIPOLYGON:
        body = struct.pack("<I", len(g.parts))
        for rings in g.parts:
            poly = Geometry(GeomKind.POLYGON, parts=[rings])
            body += _to_wkb(poly, dim)
        return head + body
    if g.kind == GeomKind.GEOMETRYCOLLECTION:
        body = struct.pack("<I", len(g.members))
        for m in g.members:
            body += _to_wkb(m, dim)
        return head + body
    raise ValueError(f"WKB write: unsupported kind {g.kind}")


# --------------------------------------------------------------------------
# parse
# --------------------------------------------------------------------------

class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("WKB truncated")
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b


def _read_header(r: _Reader) -> tuple[str, int, int, bool]:
    """-> (endian_char, base_kind, n_dims_present, has_m)."""
    order = r.take(1)[0]
    if order == 0:
        en = ">"
    elif order == 1:
        en = "<"
    else:
        raise ValueError(f"WKB bad byte order {order}")
    (code,) = struct.unpack(en + "I", r.take(4))
    has_z = bool(code & _EWKB_Z)
    has_m = bool(code & _EWKB_M)
    has_srid = bool(code & _EWKB_SRID)
    code &= 0x0FFFFFFF
    if code >= 1000:  # ISO Z/M/ZM bands
        band, code = divmod(code, 1000)
        if band in (1, 3):
            has_z = True
        if band in (2, 3):
            has_m = True
    if code not in _WKB_CODES:
        raise ValueError(f"WKB unsupported geometry code {code}")
    if has_srid:
        r.take(4)  # SRID dropped: CRS handling lives in mercator.py
    return en, code, 3 if has_z else 2, has_m


def _read_coords(r: _Reader, en: str, n: int, dim: int, has_m: bool) -> np.ndarray:
    width = dim + (1 if has_m else 0)
    raw = r.take(8 * width * n)
    arr = np.frombuffer(raw, dtype=en + "f8").reshape(n, width)
    return np.ascontiguousarray(arr[:, :dim]).astype(np.float64)


def _read_count(r: _Reader, en: str) -> int:
    (n,) = struct.unpack(en + "I", r.take(4))
    if n > 100_000_000:
        raise ValueError("WKB implausible element count")
    return n


def parse_wkb(buf: bytes) -> Geometry:
    """WKB bytes -> Geometry. Accepts ISO (2-D/Z/M/ZM) and EWKB (flag
    bits + optional SRID), both byte orders; M values are dropped."""
    r = _Reader(bytes(buf))
    g = _parse(r)
    if r.pos != len(r.buf):
        raise ValueError(f"WKB trailing bytes ({len(r.buf) - r.pos})")
    return g


def wkb_kind(buf: bytes) -> int:
    """Cheap header peek: geometry kind of a WKB blob (no full parse)."""
    r = _Reader(bytes(buf))
    _, code, _, _ = _read_header(r)
    return code


def _parse(r: _Reader) -> Geometry:
    en, code, dim, has_m = _read_header(r)
    if code == GeomKind.POINT:
        c = _read_coords(r, en, 1, dim, has_m)
        if np.isnan(c).all():  # ISO empty point
            return empty_point()
        return Geometry(GeomKind.POINT, coords=c)
    if code == GeomKind.LINESTRING:
        n = _read_count(r, en)
        return Geometry(GeomKind.LINESTRING, coords=_read_coords(r, en, n, dim, has_m))
    if code == GeomKind.POLYGON:
        n_rings = _read_count(r, en)
        rings = []
        for _ in range(n_rings):
            n = _read_count(r, en)
            rings.append(_read_coords(r, en, n, dim, has_m))
        return Geometry(GeomKind.POLYGON, parts=[rings] if rings else [])
    if code == GeomKind.MULTIPOLYGON:
        n_polys = _read_count(r, en)
        parts = []
        for _ in range(n_polys):
            member = _parse(r)
            if member.kind != GeomKind.POLYGON:
                raise ValueError("WKB MULTIPOLYGON member is not a POLYGON")
            if member.parts:
                parts.append(member.parts[0])
        return Geometry(GeomKind.MULTIPOLYGON, parts=parts)
    if code == GeomKind.MULTIPOINT:
        n = _read_count(r, en)
        pts = []
        for _ in range(n):
            member = _parse(r)
            if member.kind != GeomKind.POINT:
                raise ValueError("WKB MULTIPOINT member is not a POINT")
            pts.append(member)
        return Geometry(GeomKind.GEOMETRYCOLLECTION, members=pts)
    if code == GeomKind.MULTILINESTRING:
        n = _read_count(r, en)
        lines = []
        for _ in range(n):
            member = _parse(r)
            if member.kind != GeomKind.LINESTRING:
                raise ValueError("WKB MULTILINESTRING member is not a LINESTRING")
            lines.append(member)
        return Geometry(GeomKind.GEOMETRYCOLLECTION, members=lines)
    # GEOMETRYCOLLECTION
    n = _read_count(r, en)
    return Geometry(
        GeomKind.GEOMETRYCOLLECTION, members=[_parse(r) for _ in range(n)]
    )
