"""GeoParquet sink/source: distributed write, footer metadata, roundtrip,
and a third-party read of the emitted files with DuckDB's vanilla
parquet reader (no spatial extension needed — WKB is a binary column,
and the `geo` footer rides in the file key-value metadata)."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from geokitten_spark.geom.model import parse_wkt, to_wkt
from geokitten_spark.geom.wkb import parse_wkb, to_wkb
from geokitten_spark.sources.geoparquet import (
    GEO_KEY,
    geoparquet_metadata,
    read_geoparquet,
    wkb_to_wkt,
    wkt_to_wkb,
    write_geoparquet,
)


def _boundary_df(spark, n=12):
    rows = []
    for k in range(n):
        if k % 3 == 0:
            wkt = (
                f"MULTIPOLYGON ((({k} 0, {k + 2} 0, {k + 2} 3, {k} 3, {k} 0)), "
                f"(({k} 10, {k + 1} 10, {k + 1} 15, {k} 15, {k} 10)))"
            )
        else:
            wkt = (
                f"POLYGON (({k * 10} 0, {k * 10 + 7} 0, {k * 10 + 7} 4, {k * 10} 4, {k * 10} 0), "
                f"({k * 10 + 1} 1, {k * 10 + 3} 1, {k * 10 + 3} 3, {k * 10 + 1} 3, {k * 10 + 1} 1))"
            )
        rows.append((k, f"region_{k}", wkt))
    return spark.createDataFrame(rows, "key long, name string, wkt string")


def _write(spark, tmp_path, n_parts=3):
    df = (
        _boundary_df(spark)
        .withColumn("geometry", wkt_to_wkb(F.col("wkt")))
        .drop("wkt")
        .repartition(n_parts, "key")
        .sortWithinPartitions("key")
    )
    out = str(tmp_path / "gp")
    manifest = write_geoparquet(df, out, geometry_col="geometry").collect()
    return out, manifest


def test_write_emits_one_file_per_partition_with_manifest(spark, tmp_path):
    out, manifest = _write(spark, tmp_path, n_parts=3)
    assert 1 <= len(manifest) <= 3
    assert sum(m.n_rows for m in manifest) == 12
    for m in manifest:
        assert m.file.endswith(".parquet")
        assert m.minx <= m.maxx and m.miny <= m.maxy
        assert set(json.loads(m.geometry_types)) <= {"Polygon", "MultiPolygon"}


def test_geo_footer_metadata_is_spec_shaped(spark, tmp_path):
    out, _ = _write(spark, tmp_path)
    geo = geoparquet_metadata(out)
    assert geo["version"] == "1.0.0"
    assert geo["primary_column"] == "geometry"
    spec = geo["columns"]["geometry"]
    assert spec["encoding"] == "WKB"
    assert set(spec["geometry_types"]) <= {"Polygon", "MultiPolygon"}
    assert len(spec["bbox"]) == 4 and spec["bbox"][0] <= spec["bbox"][2]


def test_roundtrip_geometries_bit_exact(spark, tmp_path):
    out, _ = _write(spark, tmp_path)
    back = read_geoparquet(spark, out)
    got = {r.key: r.geometry_wkt for r in back.collect()}
    want = {r.key: to_wkt(parse_wkt(r.wkt)) for r in _boundary_df(spark).collect()}
    assert got == want
    # and the raw WKB bytes survive the parquet roundtrip untouched
    raw = {r.key: bytes(r.geometry) for r in back.collect()}
    for k, wkt in want.items():
        assert raw[k] == to_wkb(parse_wkt(wkt))


def test_attribute_pushdown_survives(spark, tmp_path):
    out, _ = _write(spark, tmp_path)
    df = read_geoparquet(spark, out, as_wkt=False).filter(F.col("key") == 7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(key), EqualTo(key,7)" in plan
    assert df.count() == 1


def test_duckdb_reads_our_files(spark, tmp_path):
    # Third-party parquet reader consumes the sink's output directly and
    # sees the same WKB bytes Spark wrote.
    duckdb = pytest.importorskip("duckdb")
    out, _ = _write(spark, tmp_path)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT key, geometry FROM read_parquet('{out}/*.parquet') ORDER BY key"
    ).fetchall()
    assert len(rows) == 12
    for k, blob in rows:
        g = parse_wkb(bytes(blob))
        expected_kind = "MULTIPOLYGON" if k % 3 == 0 else "POLYGON"
        assert to_wkt(g).startswith(expected_kind)
    # file-level geo metadata is visible to any footer reader
    kv = con.execute(
        f"SELECT key, value FROM parquet_kv_metadata('{out}/*.parquet')"
    ).fetchall()
    geo_vals = [v for key, v in kv if bytes(key) == GEO_KEY]
    assert geo_vals, "geo footer metadata missing from parquet key-value store"
    parsed = json.loads(bytes(geo_vals[0]))
    assert parsed["columns"]["geometry"]["encoding"] == "WKB"


def test_reader_rejects_plain_parquet(spark, tmp_path):
    plain = str(tmp_path / "plain")
    spark.range(5).write.parquet(plain)
    with pytest.raises(ValueError, match="geo"):
        geoparquet_metadata(plain)


def test_wkb_columns_null_safe(spark):
    df = spark.createDataFrame(
        [("POINT (1 2)",), (None,)], "wkt string"
    ).withColumn("geometry", wkt_to_wkb(F.col("wkt")))
    rows = {r.wkt: r for r in df.withColumn("back", wkb_to_wkt(F.col("geometry"))).collect()}
    assert rows["POINT (1 2)"].back == "POINT (1 2)"
    assert rows[None].geometry is None and rows[None].back is None


def test_points_to_wkb_matches_wkt_path(spark):
    from geokitten_spark.sources.geoparquet import points_to_wkb

    df = spark.createDataFrame(
        [(1, -122.25, 37.5), (2, 0.0, 0.0), (3, None, 12.0), (4, 179.9, -89.9)],
        "id long, lon double, lat double",
    )
    rows = df.select(
        "id",
        points_to_wkb(F.col("lon"), F.col("lat")).alias("fast"),
        wkt_to_wkb(
            F.when(
                F.col("lon").isNotNull(),
                F.format_string("POINT (%s %s)", "lon", "lat"),
            )
        ).alias("slow"),
    ).collect()
    for r in rows:
        if r.id == 3:
            assert r.fast is None and r.slow is None
        else:
            assert bytes(r.fast) == bytes(r.slow)
            g = parse_wkb(bytes(r.fast))
            assert to_wkt(g).startswith("POINT")


def test_empty_partitions_write_no_files(spark, tmp_path):
    df = (
        _boundary_df(spark, n=2)
        .withColumn("geometry", wkt_to_wkb(F.col("wkt")))
        .drop("wkt")
        .repartition(8)
    )
    out = str(tmp_path / "sparse")
    manifest = write_geoparquet(df, out).collect()
    assert sum(m.n_rows for m in manifest) == 2
    import os

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == len(manifest) <= 2
