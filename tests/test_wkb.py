"""WKB codec: spec byte-vectors, WKT parity, EWKB/ISO variant parsing.

The little-endian POINT(1 2) bytes below are the canonical example from
the OGC Simple Features spec / PostGIS docs; the others are assembled
byte-by-byte from the spec's layout rules, so the codec is pinned to the
published format, not to its own roundtrip.
"""

import struct

import numpy as np
import pytest

from geokitten_spark.geom.model import GeomKind, parse_wkt, to_wkt
from geokitten_spark.geom.wkb import parse_wkb, to_wkb, wkb_kind


def d(*vals):  # little-endian doubles
    return struct.pack("<%dd" % len(vals), *vals)


def u32(v):
    return struct.pack("<I", v)


# --------------------------------------------------------------------------
# pinned spec vectors
# --------------------------------------------------------------------------

def test_point_little_endian_vector():
    # 01 01000000 <1.0> <2.0> — the spec's own example encoding
    vec = b"\x01" + u32(1) + d(1.0, 2.0)
    assert to_wkb(parse_wkt("POINT (1 2)")) == vec
    g = parse_wkb(vec)
    assert g.kind == GeomKind.POINT
    assert np.allclose(g.coords, [[1.0, 2.0]])


def test_point_big_endian_parses():
    vec = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 1.0, 2.0)
    assert to_wkt(parse_wkb(vec)) == "POINT (1 2)"


def test_polygon_with_hole_vector():
    shell = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    hole = [(3, 3), (3, 7), (7, 7), (3, 3)]
    vec = (
        b"\x01" + u32(3) + u32(2)
        + u32(len(shell)) + b"".join(d(x, y) for x, y in shell)
        + u32(len(hole)) + b"".join(d(x, y) for x, y in hole)
    )
    g = parse_wkb(vec)
    assert g.kind == GeomKind.POLYGON
    assert len(g.parts[0]) == 2
    assert to_wkb(g) == vec  # writer reproduces the spec layout exactly


def test_multipolygon_roundtrip_layout():
    wkt = "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 0)), ((10 10, 12 10, 12 12, 10 10)))"
    vec = to_wkb(parse_wkt(wkt))
    # header: LE, code 6, 2 members, each a full POLYGON wkb
    assert vec[:5] == b"\x01" + u32(6)
    assert vec[5:9] == u32(2)
    assert vec[9:14] == b"\x01" + u32(3)
    assert to_wkt(parse_wkb(vec)) == wkt


def test_iso_z_point():
    vec = b"\x01" + u32(1001) + d(1.0, 2.0, 3.0)
    g = parse_wkb(vec)
    assert g.coords.shape == (1, 3)
    assert to_wkb(g) == vec  # Z writes back as ISO 1001


def test_iso_m_dropped():
    vec = b"\x01" + u32(2001 + 1000) + d(1, 2, 3, 4)  # ZM point: x y z m
    g = parse_wkb(vec)
    assert np.allclose(g.coords, [[1.0, 2.0, 3.0]])
    vec_m = b"\x01" + u32(2001) + d(1, 2, 9)  # M-only: x y m
    assert np.allclose(parse_wkb(vec_m).coords, [[1.0, 2.0]])


def test_ewkb_flags_and_srid():
    # PostGIS-style: Z flag + SRID flag + srid=4326 payload
    code = 1 | 0x80000000 | 0x20000000
    vec = b"\x01" + u32(code) + u32(4326) + d(5.0, 6.0, 7.0)
    g = parse_wkb(vec)
    assert np.allclose(g.coords, [[5.0, 6.0, 7.0]])


def test_empty_point_nan_convention():
    g = parse_wkb(to_wkb(parse_wkt("POINT EMPTY")))
    assert g.kind == GeomKind.POINT and g.is_empty


def test_geometrycollection_mixed_endian_members():
    pt_be = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 1, 2)
    ls_le = b"\x01" + u32(2) + u32(2) + d(0, 0, 3, 4)
    vec = b"\x01" + u32(7) + u32(2) + pt_be + ls_le
    g = parse_wkb(vec)
    assert g.kind == GeomKind.GEOMETRYCOLLECTION
    assert to_wkt(g) == "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 3 4))"


def test_multipoint_and_multilinestring_widen_to_collection():
    mp = b"\x01" + u32(4) + u32(2) + (b"\x01" + u32(1) + d(1, 1)) + (
        b"\x01" + u32(1) + d(2, 2)
    )
    g = parse_wkb(mp)
    assert g.kind == GeomKind.GEOMETRYCOLLECTION
    assert [to_wkt(m) for m in g.members] == ["POINT (1 1)", "POINT (2 2)"]


# --------------------------------------------------------------------------
# parity + robustness
# --------------------------------------------------------------------------

@pytest.mark.parametrize(
    "wkt",
    [
        "POINT (1.5 -2.25)",
        "POINT (180 -90 12.5)",
        "LINESTRING (0 0, 1 1, 2 0.5)",
        "LINESTRING EMPTY",
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))",
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (3 3, 3 7, 7 7, 7 3, 3 3))",
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 0)), ((1 1, 2 1, 2 2, 1 1), (1.2 1.2, 1.4 1.2, 1.4 1.4, 1.2 1.2)))",
        "GEOMETRYCOLLECTION (POINT (1 2), POLYGON ((0 0, 1 0, 1 1, 0 0)))",
        "MULTIPOLYGON EMPTY",
    ],
)
def test_wkt_wkb_wkt_identity(wkt):
    base = to_wkt(parse_wkt(wkt))
    assert to_wkt(parse_wkb(to_wkb(parse_wkt(wkt)))) == base


def test_random_polygons_roundtrip_exact():
    rng = np.random.default_rng(99)
    for _ in range(50):
        n = int(rng.integers(3, 12))
        pts = rng.uniform(-180, 180, size=(n, 2))
        ring = np.vstack([pts, pts[:1]])
        wkt = "POLYGON ((" + ", ".join(f"{x!r} {y!r}" for x, y in ring) + "))"
        g = parse_wkt(wkt)
        g2 = parse_wkb(to_wkb(g))
        assert np.array_equal(g.parts[0][0], g2.parts[0][0])  # bit-exact doubles


def test_kind_peek():
    assert wkb_kind(to_wkb(parse_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))"))) == 6


def test_truncated_and_trailing_raise():
    vec = to_wkb(parse_wkt("POINT (1 2)"))
    with pytest.raises(ValueError, match="truncated"):
        parse_wkb(vec[:-1])
    with pytest.raises(ValueError, match="trailing"):
        parse_wkb(vec + b"\x00")
    with pytest.raises(ValueError, match="byte order"):
        parse_wkb(b"\x05" + vec[1:])
