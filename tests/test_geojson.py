"""GeoJSON scan/sink: parse exactness, roundtrip, bad-file skip, and
cross-format parity with the KML scan on the same geometry corpus."""

import json

import pytest

from geokitten_spark.fixtures import admin_polygons_pdf, kml_corpus
from geokitten_spark.sources.geojson import (
    geojson_geometry_to_geometry,
    geometry_to_geojson_geometry,
    parse_geojson_bytes,
    read_geojson_dir,
    render_geojson,
    write_geojson,
)
from geokitten_spark.geom.model import parse_wkt, to_wkt


FC = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "id": "sq",
            "properties": {"name": "square", "pop": 7},
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                    [[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]],
                ],
            },
        },
        {
            "type": "Feature",
            "properties": {"id": "mp"},
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [
                    [[[20, 0], [21, 0], [21, 1], [20, 0]]],
                    [[[30, 0], [31, 0], [31, 1], [30, 0]]],
                ],
            },
        },
        {
            "type": "Feature",
            "properties": {},
            "geometry": {"type": "Point", "coordinates": [1.5, -2.25]},
        },
        {
            "type": "Feature",
            "properties": {},
            "geometry": {
                "type": "LineString",
                "coordinates": [[0, 0], [1, 1], [2, 0.5]],
            },
        },
    ],
}


def test_parse_feature_collection():
    rows = parse_geojson_bytes(json.dumps(FC).encode())
    assert [r[0] for r in rows] == ["sq", "mp", "2", "3"]
    wkts = {r[0]: r[2] for r in rows}
    assert wkts["sq"] == (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    )
    assert wkts["mp"].startswith("MULTIPOLYGON (((20 0, 21 0, 21 1, 20 0))")
    assert wkts["2"] == "POINT (1.5 -2.25)"
    assert wkts["3"] == "LINESTRING (0 0, 1 1, 2 0.5)"
    # properties canonical form: sorted keys, no whitespace
    props = {r[0]: r[1] for r in rows}
    assert props["sq"] == '{"name":"square","pop":7}'


def test_parse_bare_geometry_and_single_feature():
    bare = {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}
    rows = parse_geojson_bytes(json.dumps(bare).encode())
    assert len(rows) == 1 and rows[0][2].startswith("POLYGON")
    feat = {"type": "Feature", "id": 42, "properties": None, "geometry": bare}
    rows = parse_geojson_bytes(json.dumps(feat).encode())
    assert rows[0][0] == "42" and rows[0][1] == "{}"


def test_multipoint_multilinestring_normalize_to_collection():
    mp = {"type": "MultiPoint", "coordinates": [[0, 0], [1, 1]]}
    g = geojson_geometry_to_geometry(mp)
    assert to_wkt(g) == "GEOMETRYCOLLECTION (POINT (0 0), POINT (1 1))"
    mls = {"type": "MultiLineString", "coordinates": [[[0, 0], [1, 0]], [[2, 2], [3, 3]]]}
    assert to_wkt(geojson_geometry_to_geometry(mls)) == (
        "GEOMETRYCOLLECTION (LINESTRING (0 0, 1 0), LINESTRING (2 2, 3 3))"
    )


def test_roundtrip_exact_on_fixture_polygons():
    """parse→render→parse is coordinate-exact on the 200-polygon fixture
    (jittered hex rings: non-trivial float coordinates)."""
    pdf = admin_polygons_pdf()
    rows = [
        (str(r["region_id"]), {"region_id": int(r["region_id"])}, r["geometry_wkt"])
        for _, r in pdf.iterrows()
    ]
    text = render_geojson(rows)
    back = parse_geojson_bytes(text.encode())
    assert len(back) == len(rows)
    for (fid0, _, wkt0), (fid1, _, wkt1) in zip(rows, back):
        assert fid1 == fid0
        # fixture WKT uses %.6f formatting; values round-trip exactly, so
        # canonical (shortest-repr) WKT of both sides must be byte-equal
        assert wkt1 == to_wkt(parse_wkt(wkt0))


def test_wkt_geojson_wkt_identity_cases():
    for wkt in [
        "POINT (3 4)",
        "POINT EMPTY",
        "LINESTRING (0 0, 1 2, 3 4.5)",
        "POLYGON ((0 0, 1 0, 1 1, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
        "GEOMETRYCOLLECTION (POINT (1 1), POLYGON ((0 0, 1 0, 1 1, 0 0)))",
    ]:
        g = parse_wkt(wkt)
        assert to_wkt(geojson_geometry_to_geometry(geometry_to_geojson_geometry(g))) == wkt


@pytest.fixture(scope="module")
def geojson_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("geojsons")
    (d / "a.geojson").write_text(json.dumps(FC))
    bare = {"type": "Polygon", "coordinates": [[[50, 0], [51, 0], [51, 1], [50, 0]]]}
    (d / "b.geojson").write_text(json.dumps(bare))
    (d / "broken.geojson").write_text("{not json")
    (d / "ignored.txt").write_text("not geojson at all")
    return str(d)


def test_read_geojson_dir_scan(spark, geojson_dir):
    df = read_geojson_dir(spark, geojson_dir)
    rows = {(r.file_name, r.feature_id): r for r in df.collect()}
    # 4 features from a.geojson + 1 bare geometry from b; broken skipped
    assert len(rows) == 5
    assert rows[("a.geojson", "sq")].geometry_wkt.startswith("POLYGON ((0 0, 10 0")
    assert json.loads(rows[("a.geojson", "sq")].properties)["pop"] == 7
    assert rows[("b.geojson", "0")].geometry_wkt.startswith("POLYGON ((50 0")


def test_write_then_read_spark_roundtrip(spark, tmp_path):
    """Distributed scan of the sink's output reproduces the source rows."""
    pdf = admin_polygons_pdf().head(25)
    src = spark.createDataFrame(pdf[["region_id", "geometry_wkt"]])
    out = str(tmp_path / "out" / "regions.geojson")
    n = write_geojson(
        src, out, id_col="region_id", wkt_col="geometry_wkt", properties_col=None
    )
    assert n == 25
    back = read_geojson_dir(spark, str(tmp_path / "out")).toPandas()
    assert len(back) == 25
    exp = {
        str(r["region_id"]): to_wkt(parse_wkt(r["geometry_wkt"]))
        for _, r in pdf.iterrows()
    }
    got = dict(zip(back["feature_id"], back["geometry_wkt"]))
    assert got == exp


def test_cross_format_kml_parity(spark, tmp_path):
    """The same geometries through the KML scan and the GeoJSON scan land
    identically (WKT-exact), so downstream joins are format-independent."""
    from geokitten_spark.sources.kml import parse_kml_bytes

    corpus = kml_corpus()
    kml_geoms = {}
    for _, row in corpus.iterrows():
        for name, wkt in parse_kml_bytes(row["kml_bytes"]):
            kml_geoms[f"{row['file_name']}::{name}"] = wkt
    rows = [(k, {}, w) for k, w in sorted(kml_geoms.items())]
    (tmp_path / "c.geojson").write_text(render_geojson(rows))
    back = read_geojson_dir(spark, str(tmp_path)).toPandas()
    got = dict(zip(back["feature_id"], back["geometry_wkt"]))
    assert got == kml_geoms


def test_geojson_boundaries_feed_pip_join(spark, geojson_dir, tmp_path):
    """Boundary polygons loaded from GeoJSON drive pip_join identically to
    the same polygons passed as a WKT DataFrame (S1 → J2 integration)."""
    from geokitten_spark.operators.pip_join import pip_join
    import pandas as pd

    bounds_pdf = admin_polygons_pdf().head(10)[["region_id", "geometry_wkt"]]
    out = str(tmp_path / "bounds" / "regions.geojson")
    write_geojson(
        spark.createDataFrame(bounds_pdf), out,
        id_col="region_id", wkt_col="geometry_wkt", properties_col=None,
    )
    from_geojson = (
        read_geojson_dir(spark, str(tmp_path / "bounds"))
        .toPandas()[["feature_id", "geometry_wkt"]]
        .rename(columns={"feature_id": "region_id"})
    )

    import numpy as np

    # sample inside the fixture polygons' combined bbox so the join is hot
    boxes = [parse_wkt(w).bbox() for w in bounds_pdf["geometry_wkt"]]
    xmin = min(b[0] for b in boxes); ymin = min(b[1] for b in boxes)
    xmax = max(b[2] for b in boxes); ymax = max(b[3] for b in boxes)
    rng = np.random.default_rng(7)
    pts = pd.DataFrame(
        {
            "pt_id": range(500),
            "lon": rng.uniform(xmin, xmax, 500),
            "lat": rng.uniform(ymin, ymax, 500),
        }
    )
    docs = spark.createDataFrame(pts)
    a = pip_join(docs, bounds_pdf, id_col="region_id", wkt_col="geometry_wkt")
    b = pip_join(docs, from_geojson, id_col="region_id", wkt_col="geometry_wkt")
    ra = sorted((r.pt_id, str(r.region_id)) for r in a.select("pt_id", "region_id").collect())
    rb = sorted((r.pt_id, str(r.region_id)) for r in b.select("pt_id", "region_id").collect())
    assert ra == rb and len(ra) > 0


def test_geojson_to_choropleth_end_to_end(spark, tmp_path):
    """Full format→viz lane: boundaries from a GeoJSON file scan feed the
    choropleth renderer (S1 → V1 lifecycle through the new source)."""
    import json as _json

    from geokitten_spark.fixtures import admin_polygons_pdf
    from geokitten_spark.viz.choropleth import render_categorical_choropleth

    pdf = admin_polygons_pdf().head(12)
    rows = [
        (str(r["region_id"]), {"region": f"zone{i % 3}"}, r["geometry_wkt"])
        for i, (_, r) in enumerate(pdf.iterrows())
    ]
    (tmp_path / "b.geojson").write_text(render_geojson(rows))
    scanned = read_geojson_dir(spark, str(tmp_path)).toPandas()
    scanned["region"] = scanned["properties"].map(
        lambda p: _json.loads(p)["region"]
    )
    html = render_categorical_choropleth(
        scanned, "region", wkt_col="geometry_wkt",
        tooltip_columns=["feature_id", "region"], title="from geojson",
    )
    assert "<svg" in html and "polygon" in html and "from geojson" in html
