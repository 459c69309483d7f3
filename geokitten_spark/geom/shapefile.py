"""Pure-numpy ESRI shapefile (.shp) + dBASE (.dbf) reader — SURVEY §2.1 S1.

Implements just enough of the public shapefile spec (ESRI whitepaper,
July 1998) to load the reference's test fixtures without GDAL/fiona:
shape types Point(1), PolyLine(3), Polygon(5) and their Z variants
(11/13/15); DBF field types C/N/F/D/L. Ring grouping follows the spec:
clockwise rings are exteriors, counter-clockwise rings are holes assigned
to the exterior that contains them.

The reference reads these files via ``gpd.read_file``
(``gdf_standardization.py:165-180``); this module is the engine's native
replacement so the reference's real fixtures (124-row standardization
file, 995-row choropleth file, golden shapefiles) can drive parity tests.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .model import Geometry, GeomKind
from .kernels import ring_signed_area, points_in_rings

__all__ = ["read_dbf", "read_shp", "read_shapefile", "read_prj_crs"]


# ---------------------------------------------------------------------------
# .dbf
# ---------------------------------------------------------------------------

def read_dbf(path: str, encoding: str = "utf-8") -> pd.DataFrame:
    data = open(path, "rb").read()
    n_records = struct.unpack_from("<I", data, 4)[0]
    header_size, record_size = struct.unpack_from("<HH", data, 8)
    fields = []
    off = 32
    while data[off] != 0x0D:
        name = data[off : off + 11].split(b"\x00", 1)[0].decode("ascii")
        ftype = chr(data[off + 11])
        flen = data[off + 16]
        fdec = data[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    rows = []
    pos = header_size
    for _ in range(n_records):
        rec = data[pos : pos + record_size]
        pos += record_size
        if not rec or rec[0:1] == b"*":  # deleted
            continue
        vals = {}
        o = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[o : o + flen]
            o += flen
            txt = raw.decode(encoding, errors="replace").strip()
            if ftype in ("N", "F"):
                if txt == "":
                    vals[name] = None
                elif fdec or ftype == "F" or "." in txt:
                    vals[name] = float(txt)
                else:
                    vals[name] = int(txt)
            elif ftype == "L":
                vals[name] = txt.upper() in ("T", "Y")
            else:
                vals[name] = txt
        rows.append(vals)
    return pd.DataFrame(rows, columns=[f[0] for f in fields])


# ---------------------------------------------------------------------------
# .shp
# ---------------------------------------------------------------------------

def _group_rings(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Spec ring grouping: CW exteriors, CCW holes → parts [ext, *holes]."""
    if len(rings) == 1:
        return [[rings[0]]]
    exts, holes = [], []
    for r in rings:
        # shapefile spec: exterior rings are clockwise => negative shoelace
        (exts if ring_signed_area(r) <= 0 else holes).append(r)
    if not exts:  # degenerate: treat all as exteriors
        return [[r] for r in rings]
    parts = [[e] for e in exts]
    for h in holes:
        placed = False
        hx, hy = h[0, 0], h[0, 1]
        for part in parts:
            if points_in_rings(np.array([hx]), np.array([hy]), [part[0]])[0]:
                part.append(h)
                placed = True
                break
        if not placed:
            parts.append([h])  # orphan hole: keep as its own exterior
    return parts


def read_shp(path: str) -> list[Geometry]:
    data = open(path, "rb").read()
    file_len = struct.unpack_from(">I", data, 24)[0] * 2
    geoms = []
    pos = 100
    while pos < file_len:
        content_len = struct.unpack_from(">I", data, pos + 4)[0] * 2
        rec = data[pos + 8 : pos + 8 + content_len]
        pos += 8 + content_len
        stype = struct.unpack_from("<i", rec, 0)[0]
        base = stype % 10  # Z variants: 11/13/15 -> 1/3/5
        if stype == 0:
            geoms.append(Geometry(GeomKind.POLYGON, []))
        elif base == 1:  # Point / PointZ
            x, y = struct.unpack_from("<2d", rec, 4)
            geoms.append(Geometry(GeomKind.POINT, np.array([[x, y]])))
        elif base in (3, 5):  # PolyLine / Polygon (+Z)
            n_parts, n_points = struct.unpack_from("<2i", rec, 36)
            part_idx = np.frombuffer(rec, dtype="<i4", count=n_parts, offset=44)
            pts = np.frombuffer(
                rec, dtype="<f8", count=2 * n_points, offset=44 + 4 * n_parts
            ).reshape(-1, 2)
            bounds = list(part_idx) + [n_points]
            rings = [
                np.array(pts[bounds[i] : bounds[i + 1]]) for i in range(n_parts)
            ]
            if base == 5:
                parts = _group_rings(rings)
                kind = GeomKind.POLYGON if len(parts) == 1 else GeomKind.MULTIPOLYGON
                geoms.append(Geometry(kind, parts))
            else:
                geoms.append(Geometry(GeomKind.LINESTRING, [rings]))
        else:
            raise NotImplementedError(f"shape type {stype}")
    return geoms


def read_prj_crs(path: str) -> str:
    """Best-effort CRS detection from .prj WKT (the two CRSs the reference
    uses: WGS84 geographic and Web-Mercator)."""
    try:
        txt = open(path).read()
    except OSError:
        return "EPSG:4326"
    if "Mercator" in txt:
        return "EPSG:3857"
    return "EPSG:4326"


def read_shapefile(path_no_ext: str) -> tuple[pd.DataFrame, list[Geometry], str]:
    """(attributes, geometries, crs) for ``path_no_ext`` (.shp/.dbf/.prj)."""
    base = path_no_ext[:-4] if path_no_ext.endswith(".shp") else path_no_ext
    attrs = read_dbf(base + ".dbf")
    geoms = read_shp(base + ".shp")
    crs = read_prj_crs(base + ".prj")
    return attrs, geoms, crs
