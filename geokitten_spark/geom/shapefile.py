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

__all__ = [
    "read_dbf",
    "read_shp",
    "read_shapefile",
    "read_prj_crs",
    "orient_rings",
    "write_shp",
    "write_dbf",
    "write_shapefile",
]


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
            geoms.append(Geometry(GeomKind.POINT, coords=np.array([[x, y]])))
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
            elif len(rings) == 1:
                geoms.append(Geometry(GeomKind.LINESTRING, coords=rings[0]))
            else:  # multi-part PolyLine → collection of linestrings
                geoms.append(
                    Geometry(
                        GeomKind.GEOMETRYCOLLECTION,
                        members=[
                            Geometry(GeomKind.LINESTRING, coords=r) for r in rings
                        ],
                    )
                )
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


# ---------------------------------------------------------------------------
# writer (.shp + .shx + .dbf + .prj) — SURVEY §2.1 S6 (shapefile sink)
# ---------------------------------------------------------------------------
# The reference writes shapefiles through gpd.to_file (OGR); this is the
# engine's native replacement, emitting the same ESRI-spec layout the
# reader above parses: Polygon(5)/Point(1)/PolyLine(3), CW exteriors /
# CCW holes, closed rings, .shx record index, dBASE III attributes.

_WGS84_PRJ = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)


def orient_rings(g: Geometry) -> Geometry:
    """Shapefile ring orientation: exteriors CW (signed area <= 0), holes
    CCW. Returns a new Geometry; non-polygonal geometries pass through."""
    if g.kind not in (GeomKind.POLYGON, GeomKind.MULTIPOLYGON):
        return g
    parts = []
    for rings in g.parts:
        fixed = []
        for i, r in enumerate(rings):
            r = np.asarray(r, dtype=np.float64)[:, :2]
            cw = ring_signed_area(r) <= 0
            want_cw = i == 0
            fixed.append(r if cw == want_cw else r[::-1])
        parts.append(fixed)
    return Geometry(g.kind, parts)


def _flat_rings(g: Geometry) -> list[np.ndarray]:
    """All rings of a (multi)polygon in write order, orientation enforced."""
    return [r for rings in orient_rings(g).parts for r in rings]


def _shp_record(g: Geometry) -> bytes:
    if g is None or g.is_empty:
        return struct.pack("<i", 0)  # Null shape
    if g.kind == GeomKind.POINT:
        x, y = float(g.coords[0, 0]), float(g.coords[0, 1])
        return struct.pack("<i2d", 1, x, y)
    if g.kind in (GeomKind.LINESTRING, GeomKind.LINEARRING):
        rings = [np.asarray(g.coords, dtype=np.float64)[:, :2]]
        stype = 3
    elif g.kind in (GeomKind.POLYGON, GeomKind.MULTIPOLYGON):
        rings = _flat_rings(g)
        stype = 5
    else:
        raise NotImplementedError(
            f"shapefile write: unsupported kind {GeomKind.NAMES.get(g.kind)}"
        )
    allpts = np.vstack(rings)
    offs, total = [], 0
    for r in rings:
        offs.append(total)
        total += len(r)
    return (
        struct.pack(
            "<i4d2i",
            stype,
            float(allpts[:, 0].min()),
            float(allpts[:, 1].min()),
            float(allpts[:, 0].max()),
            float(allpts[:, 1].max()),
            len(rings),
            total,
        )
        + struct.pack(f"<{len(rings)}i", *offs)
        + allpts.astype("<f8").tobytes()
    )


def write_shp(path_no_ext: str, geoms: list[Geometry]) -> None:
    """Write ``.shp`` + ``.shx``. All non-empty geometries must share one
    family (polygonal / point / line); empties become Null shapes."""
    records = [_shp_record(g) for g in geoms]
    stypes = {struct.unpack_from("<i", r, 0)[0] for r in records} - {0}
    if len(stypes) > 1:
        raise ValueError(f"mixed shape types in one file: {sorted(stypes)}")
    stype = stypes.pop() if stypes else 0

    boxes = []
    for g in geoms:
        if g is not None and not g.is_empty:
            b = g.bbox()
            if not np.isnan(b[0]):
                boxes.append(b)
    if boxes:
        xmin = min(b[0] for b in boxes); ymin = min(b[1] for b in boxes)
        xmax = max(b[2] for b in boxes); ymax = max(b[3] for b in boxes)
    else:
        xmin = ymin = xmax = ymax = 0.0

    def header(total_words: int) -> bytes:
        return (
            struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, total_words)
            + struct.pack("<2i", 1000, stype)
            + struct.pack("<4d", xmin, ymin, xmax, ymax)
            + struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
        )

    shp_words = 50 + sum(4 + len(r) // 2 for r in records)
    shx_words = 50 + 4 * len(records)
    with open(path_no_ext + ".shp", "wb") as shp, open(
        path_no_ext + ".shx", "wb"
    ) as shx:
        shp.write(header(shp_words))
        shx.write(header(shx_words))
        offset_words = 50
        for i, rec in enumerate(records):
            content_words = len(rec) // 2
            shp.write(struct.pack(">2i", i + 1, content_words) + rec)
            shx.write(struct.pack(">2i", offset_words, content_words))
            offset_words += 4 + content_words


def write_dbf(path: str, attrs: pd.DataFrame, encoding: str = "utf-8") -> None:
    """dBASE III writer: strings → C, ints → N(18,0), floats → N(19,6),
    bools → L. Widths sized to the data (C capped at 254)."""
    import datetime

    # (source column, dbf field name truncated to the 10-char limit, ...)
    fields = []
    for name in attrs.columns:
        col = attrs[name]
        if col.dtype == bool:
            fields.append((name, name[:10], "L", 1, 0))
        elif np.issubdtype(col.dtype, np.integer):
            fields.append((name, name[:10], "N", 18, 0))
        elif np.issubdtype(col.dtype, np.floating):
            fields.append((name, name[:10], "N", 19, 6))
        else:
            width = max(
                [1] + [len(str(v).encode(encoding)) for v in col.fillna("")]
            )
            fields.append((name, name[:10], "C", min(width, 254), 0))

    record_size = 1 + sum(f[3] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    today = datetime.date.today()
    out = bytearray()
    out += struct.pack(
        "<4BIHH20x",
        0x03, today.year % 100, today.month, today.day,
        len(attrs), header_size, record_size,
    )
    for _src, name, ftype, flen, fdec in fields:
        out += struct.pack(
            "<11sc4xBB14x", name.encode("ascii"), ftype.encode("ascii"), flen, fdec
        )
    out += b"\x0d"
    for _, row in attrs.iterrows():
        out += b" "
        for src, _name, ftype, flen, fdec in fields:
            v = row[src]
            if ftype == "L":
                out += b"T" if v else b"F"
            elif ftype == "N" and fdec == 0:
                txt = "" if v is None or (isinstance(v, float) and np.isnan(v)) else str(int(v))
                out += txt.rjust(flen).encode("ascii")[:flen]
            elif ftype == "N":
                txt = "" if v is None or (isinstance(v, float) and np.isnan(v)) else f"{float(v):.{fdec}f}"
                out += txt.rjust(flen).encode("ascii")[:flen]
            else:
                raw = ("" if v is None else str(v)).encode(encoding)[:flen]
                out += raw.ljust(flen)
    out += b"\x1a"
    with open(path, "wb") as f:
        f.write(bytes(out))


def write_shapefile(
    path_no_ext: str, attrs: pd.DataFrame, geoms: list[Geometry],
    crs_wkt: str = _WGS84_PRJ,
) -> None:
    """Full sink: ``.shp`` + ``.shx`` + ``.dbf`` + ``.prj`` — the inverse
    of ``read_shapefile`` (roundtrip-tested)."""
    if len(attrs) != len(geoms):
        raise ValueError(f"{len(attrs)} attribute rows vs {len(geoms)} geometries")
    write_shp(path_no_ext, geoms)
    write_dbf(path_no_ext + ".dbf", attrs)
    with open(path_no_ext + ".prj", "w") as f:
        f.write(crs_wkt)
