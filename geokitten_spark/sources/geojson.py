"""GeoJSON conversion surface (SURVEY.md §2.1 S1 — the GeoJSON half).

The reference ingests GeoJSON through ``gpd.read_file`` (any OGR driver —
``gdf_standardization.py:454-472``) and emits it through GeoPandas'
``to_file``/``__geo_interface__``; this module re-expresses both halves
without GeoPandas:

* scan — ``spark.read.format('binaryFile')`` over ``*.geojson``/``*.json``
  + ``mapInPandas`` parse (stdlib ``json`` + the pure-numpy ``geom`` model).
  Unreadable files yield no rows, mirroring the KML scan's bad-file skip
  (``gdf_kml_converter.py:130-133``).
* sink — a deterministic FeatureCollection renderer (driver-side: boundary
  sets and tile aggregates are O(10^4) rows; the 10^12-row side of a join
  never round-trips through a text format).

Coordinates parse to float64 and render via ``repr``-shortest floats, so
parse→render→parse is exact (same discipline as ``geom.model.to_wkt``).

Type normalization: MultiPoint / MultiLineString become
GEOMETRYCOLLECTION of their members (the ``geom`` model keeps only the
polygonal multi-type); everything else round-trips type-exact.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from ..geom.model import Geometry, GeomKind, parse_wkt, to_wkt

__all__ = [
    "geojson_geometry_to_geometry",
    "geometry_to_geojson_geometry",
    "parse_geojson_bytes",
    "read_geojson_dir",
    "render_geojson",
    "write_geojson",
]


# ---------------------------------------------------------------------------
# geometry dict ⇄ geom model
# ---------------------------------------------------------------------------

def _coords_array(seq) -> np.ndarray:
    arr = np.asarray(seq, dtype=np.float64)
    if arr.ndim == 1:  # single position
        arr = arr.reshape(1, -1)
    return arr


def geojson_geometry_to_geometry(obj: dict) -> Geometry:
    """RFC 7946 geometry object → ``geom.model.Geometry``."""
    typ = obj["type"]
    if typ == "Point":
        c = obj["coordinates"]
        if not c:
            return Geometry(GeomKind.POINT, coords=np.empty((0, 2)))
        return Geometry(GeomKind.POINT, coords=_coords_array([c]))
    if typ == "LineString":
        return Geometry(GeomKind.LINESTRING, coords=_coords_array(obj["coordinates"]))
    if typ == "Polygon":
        rings = [_coords_array(r) for r in obj["coordinates"]]
        return Geometry(GeomKind.POLYGON, parts=[rings] if rings else [])
    if typ == "MultiPolygon":
        parts = [[_coords_array(r) for r in poly] for poly in obj["coordinates"]]
        return Geometry(GeomKind.MULTIPOLYGON, parts=parts)
    if typ == "MultiPoint":
        members = [
            Geometry(GeomKind.POINT, coords=_coords_array([c]))
            for c in obj["coordinates"]
        ]
        return Geometry(GeomKind.GEOMETRYCOLLECTION, members=members)
    if typ == "MultiLineString":
        members = [
            Geometry(GeomKind.LINESTRING, coords=_coords_array(ls))
            for ls in obj["coordinates"]
        ]
        return Geometry(GeomKind.GEOMETRYCOLLECTION, members=members)
    if typ == "GeometryCollection":
        return Geometry(
            GeomKind.GEOMETRYCOLLECTION,
            members=[geojson_geometry_to_geometry(g) for g in obj["geometries"]],
        )
    raise ValueError(f"unsupported GeoJSON geometry type: {typ}")


def _pos_list(arr: np.ndarray) -> list:
    return [[float(v) for v in row] for row in np.asarray(arr)]


def geometry_to_geojson_geometry(g: Geometry) -> dict:
    """``geom.model.Geometry`` → RFC 7946 geometry object (dict)."""
    if g.kind == GeomKind.POINT:
        if g.is_empty:
            return {"type": "Point", "coordinates": []}
        return {"type": "Point", "coordinates": _pos_list(g.coords)[0]}
    if g.kind in (GeomKind.LINESTRING, GeomKind.LINEARRING):
        return {"type": "LineString", "coordinates": _pos_list(g.coords)}
    if g.kind == GeomKind.POLYGON:
        rings = g.parts[0] if g.parts else []
        return {"type": "Polygon", "coordinates": [_pos_list(r) for r in rings]}
    if g.kind == GeomKind.MULTIPOLYGON:
        return {
            "type": "MultiPolygon",
            "coordinates": [[_pos_list(r) for r in rings] for rings in g.parts],
        }
    if g.kind == GeomKind.GEOMETRYCOLLECTION:
        return {
            "type": "GeometryCollection",
            "geometries": [geometry_to_geojson_geometry(m) for m in g.members],
        }
    raise ValueError(f"unsupported geometry kind: {GeomKind.NAMES.get(g.kind)}")


# ---------------------------------------------------------------------------
# file-level parse
# ---------------------------------------------------------------------------

def parse_geojson_bytes(data: bytes) -> list[tuple[str, str, str]]:
    """GeoJSON file bytes → [(feature_id, properties_json, wkt)].

    Accepts a FeatureCollection, a single Feature, or a bare geometry.
    feature_id precedence: top-level ``id``, then ``properties.id``, then
    the 0-based feature index (all coerced to str). Properties re-serialize
    with sorted keys and no whitespace — a canonical form both engines and
    both directions agree on."""
    obj = json.loads(data.decode("utf-8"))
    typ = obj.get("type")
    if typ == "FeatureCollection":
        feats = obj.get("features", [])
    elif typ == "Feature":
        feats = [obj]
    else:  # bare geometry
        feats = [{"type": "Feature", "properties": {}, "geometry": obj}]
    rows = []
    for idx, feat in enumerate(feats):
        geom = feat.get("geometry")
        if geom is None:  # RFC 7946 allows null geometry; nothing to join on
            continue
        props = feat.get("properties") or {}
        fid = feat.get("id", props.get("id", idx))
        rows.append(
            (
                str(fid),
                json.dumps(props, sort_keys=True, separators=(",", ":")),
                to_wkt(geojson_geometry_to_geometry(geom)),
            )
        )
    return rows


_SCAN_SCHEMA = StructType(
    [
        StructField("file_name", StringType()),
        StructField("feature_id", StringType()),
        StructField("properties", StringType()),
        StructField("geometry_wkt", StringType()),
    ]
)


def read_geojson_dir(spark: SparkSession, path: str, glob: str = "*.geojson") -> DataFrame:
    """One distributed scan of ``path/<glob>`` → (file_name, feature_id,
    properties, geometry_wkt). Bad files yield no rows.

    Scale shape: identical to the KML scan — binaryFile splits by file, the
    parse is a map-only Arrow stage, and the output lands already columnar
    for the PIP/tile joins (properties stay as a JSON string for
    ``get_json_object`` pushdown rather than exploding to a wide schema)."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(p)
                try:
                    parsed = parse_geojson_bytes(bytes(content))
                except (ValueError, KeyError, UnicodeDecodeError):
                    continue  # bad-file skip, like _safely_read_kml
                for fid, props, wkt in parsed:
                    rows.append((fname, fid, props, wkt))
            yield pd.DataFrame(
                rows, columns=["file_name", "feature_id", "properties", "geometry_wkt"]
            )

    return binary.mapInPandas(run, schema=_SCAN_SCHEMA)


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------

def render_geojson(rows: list[tuple[str, dict, str]]) -> str:
    """[(feature_id, properties dict, wkt)] → canonical FeatureCollection
    text: sorted keys, no whitespace, repr-shortest floats (parse→render→
    parse is exact)."""
    feats = []
    for fid, props, wkt in rows:
        feats.append(
            {
                "type": "Feature",
                "id": str(fid),
                "properties": props or {},
                "geometry": geometry_to_geojson_geometry(parse_wkt(wkt)),
            }
        )
    return json.dumps(
        {"type": "FeatureCollection", "features": feats},
        sort_keys=True,
        separators=(",", ":"),
    )


def write_geojson(
    df: DataFrame,
    out_path: str,
    *,
    id_col: str = "feature_id",
    wkt_col: str = "geometry_wkt",
    properties_col: str | None = "properties",
) -> int:
    """Collect a (small) boundary/aggregate DataFrame and write ONE
    FeatureCollection file on the driver. Returns the feature count.

    Driver-side by design: the renderable side of this engine is always the
    broadcast-sized one (boundary sets, tile aggregates) — the document side
    never serializes to a text format. Rows order by ``id_col`` so output
    bytes are partition-count-independent."""
    cols = [id_col, wkt_col] + ([properties_col] if properties_col else [])
    pdf = df.select(*cols).toPandas().sort_values(id_col, ignore_index=True)
    rows = []
    for _, r in pdf.iterrows():
        props = json.loads(r[properties_col]) if properties_col else {}
        rows.append((str(r[id_col]), props, r[wkt_col]))
    text = render_geojson(rows)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(text)
    return len(rows)
