"""KML conversion surface (SURVEY.md §2.1 S2-S5, §2.3 F8/F9).

Distributed re-expression of the reference's KML pipeline:

* S2 scan — ``spark.read.format('binaryFile')`` over ``*.kml`` +
  ``mapInPandas`` ElementTree parse (namespace-agnostic: both
  ``earth.google.com/kml/2.2`` and ``opengis.net/kml/2.2``); unreadable
  files are skipped, mirroring ``_safely_read_kml`` returning ``None``
  (``gdf_kml_converter.py:130-133``).
* S3 consolidate — the multi-file union is a single glob scan; the id
  column is the file stem (``gdf_kml_converter.py:211``), projection to
  exactly ``[id, geometry]`` (``:128``).
* F8/S4 render/sink — deterministic byte-exact KML writer reproducing the
  reference's ElementTree+minidom format (``gdf_kml_converter.py:276-464``):
  ns ``http://earth.google.com/kml/2.2``, 2-space minidom indent sliced at
  ``<Document>``, styles ``for_block_styling``/``for_sub_block_styling`` +
  StyleMaps, coordinates as ``x,y,0.0000`` one per line, exterior rings
  only (holes are not exported), non-polygonal rows leave a name+styleUrl
  placemark stub (``:393-404``).
* S5 proper-format rewrite — read dir (Name = file name WITH ``.kml``,
  ``gdf_kml_converter.py:715-719``) → standardize → byte-exact re-render.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Iterator
from xml.dom import minidom

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..geom import parse_wkt, to_wkt
from ..geom.model import Geometry, GeomKind

__all__ = [
    "parse_kml_bytes",
    "read_kml_dir",
    "consolidate_kml_dir",
    "render_kml",
    "kml_strings",
    "write_kml_dir",
    "kml_to_kml_proper",
    "read_shapefile_dir",
    "write_shapefile_df",
]


# ---------------------------------------------------------------------------
# F9 — KML parse (namespace-agnostic)
# ---------------------------------------------------------------------------

def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _ring_coords(elem) -> np.ndarray:
    txt = (elem.text or "").strip()
    pts = []
    for tok in txt.split():
        parts = tok.split(",")
        if len(parts) >= 2:
            pts.append((float(parts[0]), float(parts[1])))
    if not pts:
        return np.zeros((0, 2), dtype=np.float64)
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    return np.asarray(pts, dtype=np.float64)


def _polygon_rings(poly_elem) -> list:
    """Polygon element → [exterior, *holes] coordinate arrays."""
    ext = None
    holes = []
    for child in poly_elem.iter():
        tag = _local(child.tag)
        if tag == "outerBoundaryIs":
            for coords in child.iter():
                if _local(coords.tag) == "coordinates":
                    ext = _ring_coords(coords)
        elif tag == "innerBoundaryIs":
            for coords in child.iter():
                if _local(coords.tag) == "coordinates":
                    holes.append(_ring_coords(coords))
    if ext is None or len(ext) == 0:
        return []
    return [ext] + [h for h in holes if len(h)]


def parse_kml_bytes(data: bytes) -> list[tuple[str, str]]:
    """KML bytes → [(placemark_name, wkt)]; [] on parse failure (the
    reference's skip-on-error semantics)."""
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return []
    out = []
    for pm in root.iter():
        if _local(pm.tag) != "Placemark":
            continue
        name = ""
        for child in pm:
            if _local(child.tag) == "name":
                name = (child.text or "").strip()
                break
        parts = []
        for poly in pm.iter():
            if _local(poly.tag) == "Polygon":
                rings = _polygon_rings(poly)
                if rings:
                    parts.append(rings)
        if not parts:
            continue
        kind = GeomKind.POLYGON if len(parts) == 1 else GeomKind.MULTIPOLYGON
        out.append((name, to_wkt(Geometry(kind, parts))))
    return out


# ---------------------------------------------------------------------------
# S2/S3 — distributed scan + consolidation
# ---------------------------------------------------------------------------

_SCAN_SCHEMA = StructType(
    [
        StructField("file_name", StringType()),
        StructField("placemark_name", StringType()),
        StructField("geometry_wkt", StringType()),
    ]
)


def read_kml_dir(spark: SparkSession, kml_dir: str) -> DataFrame:
    """One distributed scan of ``kml_dir/*.kml`` → (file_name,
    placemark_name, geometry_wkt). Bad files yield no rows."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.kml")
        .load(kml_dir)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(path)
                for name, wkt in parse_kml_bytes(bytes(content)):
                    rows.append((fname, name, wkt))
            yield pd.DataFrame(rows, columns=["file_name", "placemark_name", "geometry_wkt"])

    return binary.mapInPandas(run, schema=_SCAN_SCHEMA)


def consolidate_kml_dir(
    spark: SparkSession,
    kml_dir: str,
    id_column_name: str = "Name",
    remove_geni: bool = False,
) -> DataFrame:
    """S3: the reference's ``KMLsToGeodataframe.consolidate``
    (``gdf_kml_converter.py:176-222``): id column = file stem, geometry
    standardized (default ``remove_geni=False`` — quirk §2.12.4), projected
    to exactly [id, geometry_wkt]."""
    from ..functions.geometry_udfs import standardize_wkt, standardize_wkt_keep_holes

    std = standardize_wkt if remove_geni else standardize_wkt_keep_holes
    scan = read_kml_dir(spark, kml_dir)
    return scan.select(
        F.regexp_replace("file_name", r"\.kml$", "").alias(id_column_name),
        std(F.col("geometry_wkt")).alias("geometry_wkt"),
    )


# ---------------------------------------------------------------------------
# F8 — byte-exact KML render kernel
# ---------------------------------------------------------------------------

def _add_style(document, style_id: str) -> None:
    style = ET.SubElement(document, "Style", id=style_id)
    line = ET.SubElement(style, "LineStyle")
    ET.SubElement(line, "color").text = "ff0000ff"
    ET.SubElement(line, "width").text = "2"
    poly = ET.SubElement(style, "PolyStyle")
    ET.SubElement(poly, "fill").text = "0"


def _add_style_map(document, map_id: str, style_url: str) -> None:
    style_map = ET.SubElement(document, "StyleMap", id=map_id)
    for key in ("normal", "highlight"):
        pair = ET.SubElement(style_map, "Pair")
        ET.SubElement(pair, "key").text = key
        ET.SubElement(pair, "styleUrl").text = style_url


def render_kml(doc_name: str, rows: list[tuple[str, str]]) -> str:
    """(document name, [(placemark_name, wkt)]) → canonical KML text.

    Byte format per ``gdf_kml_converter.py:276-464``: header + minidom
    2-space pretty Document slice; coordinates ``x,y,0.0000`` one per line;
    only exterior rings; non-polygonal rows leave a stub placemark."""
    kml = ET.Element("kml")
    kml.set("xmlns", "http://earth.google.com/kml/2.2")
    document = ET.SubElement(kml, "Document")
    ET.SubElement(document, "name").text = doc_name
    ET.SubElement(document, "open").text = "1"
    _add_style(document, "for_block_styling")
    _add_style(document, "for_sub_block_styling")
    _add_style_map(document, "sty_for_block_styling", "#for_block_styling")
    _add_style_map(document, "sty_for_sub_block_styling", "#for_sub_block_styling")

    folder = ET.SubElement(document, "Folder")
    ET.SubElement(folder, "name").text = doc_name
    for pm_name, wkt in rows:
        placemark = ET.SubElement(folder, "Placemark")
        ET.SubElement(placemark, "name").text = pm_name
        ET.SubElement(placemark, "styleUrl").text = "#sty_for_block_styling"
        g = parse_wkt(wkt)
        if not g.is_polygonal or g.is_empty:
            continue  # stub placemark remains (reference :398-404)
        for rings in g.parts:
            poly = ET.SubElement(placemark, "Polygon")
            outer = ET.SubElement(poly, "outerBoundaryIs")
            ring = ET.SubElement(outer, "LinearRing")
            ET.SubElement(ring, "tessellate").text = "1"
            ext = np.asarray(rings[0], dtype=np.float64)
            coords = "\n".join(f"{x},{y},0.0000" for x, y in ext[:, :2])
            ET.SubElement(ring, "coordinates").text = f"\n{coords}\n"

    xmlstr = minidom.parseString(ET.tostring(kml)).toprettyxml(indent="  ")
    start = xmlstr.find("<Document>")
    end = xmlstr.find("</Document>") + len("</Document>")
    document_content = xmlstr[start:end]
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<kml xmlns="http://earth.google.com/kml/2.2">\n'
        f"{document_content}\n</kml>"
    )


# ---------------------------------------------------------------------------
# S4/S5 — distributed per-id KML render + file sink
# ---------------------------------------------------------------------------

_KML_OUT_SCHEMA = StructType(
    [StructField("file_name", StringType()), StructField("kml", StringType())]
)


def kml_strings(
    df: DataFrame, id_col: str = "Name", wkt_col: str = "geometry_wkt",
    doc_name_suffix: str = "",
) -> DataFrame:
    """Distributed render: one KML document per distinct ``id_col`` value
    (grouped-map pandas UDF). Returns (file_name, kml)."""

    def render_group(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_name = str(pdf[id_col].iloc[0]) + doc_name_suffix
        rows = [(doc_name, wkt) for wkt in pdf[wkt_col]]
        fname = doc_name.replace(".kml", "") + ".kml"
        return pd.DataFrame({"file_name": [fname], "kml": [render_kml(doc_name, rows)]})

    return df.groupBy(id_col).applyInPandas(render_group, schema=_KML_OUT_SCHEMA)


def write_kml_dir(kml_df: DataFrame, output_dir: str) -> int:
    """File sink: write each (file_name, kml) row to ``output_dir``.

    CONTRACT: ``output_dir`` must be a path visible to the executors (a
    shared/distributed filesystem on a real cluster; any local path in
    local mode — the sandbox case). Executor-side writes
    (foreachPartition) create the directory inside the task, so the sink
    works even when the driver's mkdir would land on a different node.
    Returns number of files written."""
    os.makedirs(output_dir, exist_ok=True)
    n = kml_df.count()

    def write_part(rows):
        os.makedirs(output_dir, exist_ok=True)  # executor-local visibility
        for row in rows:
            with open(os.path.join(output_dir, row.file_name), "w", encoding="utf-8") as f:
                f.write(row.kml)

    kml_df.foreachPartition(write_part)
    return n


def kml_to_kml_proper(
    spark: SparkSession, input_dir: str, output_dir: str, remove_geni: bool = False
) -> int:
    """S5: canonical-KML rewrite — read every ``*.kml``, standardize, and
    re-emit in the canonical byte format. Mirrors
    ``KMLsToKMLsProperFormat.transform_format`` (``gdf_kml_converter.py:
    699-725``): the document/placemark name is the FILE name including
    ``.kml``."""
    from ..functions.geometry_udfs import standardize_wkt, standardize_wkt_keep_holes

    std = standardize_wkt if remove_geni else standardize_wkt_keep_holes
    scan = read_kml_dir(spark, input_dir).select(
        F.col("file_name").alias("Name"),
        std(F.col("geometry_wkt")).alias("geometry_wkt"),
    )
    return write_kml_dir(kml_strings(scan, id_col="Name"), output_dir)


# ---------------------------------------------------------------------------
# S1 — distributed shapefile directory scan
# ---------------------------------------------------------------------------

def read_shapefile_dir(spark: SparkSession, shp_dir: str) -> DataFrame:
    """Distributed scan of every ``*.shp`` (+sidecar .dbf/.prj) under
    ``shp_dir``: driver lists the files, executors parse them with the
    pure-numpy reader (one task per file — shapefiles are a multi-file
    unit, so a binaryFile scan can't see the sidecars together).

    Output: (file_name, crs, geometry_wkt, attrs as JSON string) — schema
    is dynamic in the reference (fiona), so attributes travel as JSON and
    callers project with ``F.get_json_object``/``from_json``.
    """
    import glob as _glob
    import json as _json

    shp_files = sorted(_glob.glob(os.path.join(shp_dir, "*.shp")))
    paths = spark.createDataFrame([(p,) for p in shp_files], ["path"])

    schema = StructType(
        [
            StructField("file_name", StringType()),
            StructField("crs", StringType()),
            StructField("geometry_wkt", StringType()),
            StructField("attrs", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..geom.shapefile import read_shapefile

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                try:
                    attrs, geoms, crs = read_shapefile(path)
                except Exception:
                    continue  # skip unreadable files (reference semantics)
                fname = os.path.basename(path)
                recs = attrs.to_dict("records")
                for rec, g in zip(recs, geoms):
                    rows.append((fname, crs, to_wkt(g), _json.dumps(rec, default=str)))
            yield pd.DataFrame(rows, columns=["file_name", "crs", "geometry_wkt", "attrs"])

    return paths.repartition(max(1, len(shp_files))).mapInPandas(run, schema=schema)


def write_shapefile_df(
    df: DataFrame,
    path_no_ext: str,
    *,
    wkt_col: str = "geometry_wkt",
    sort_col: str | None = None,
) -> int:
    """S6 sink: collect a (small) boundary/aggregate DataFrame and write
    ONE shapefile unit (.shp/.shx/.dbf/.prj) on the driver with the
    pure-numpy writer. Attribute columns = every non-geometry column.

    Driver-side by design, like ``write_geojson``: shapefiles are a
    multi-file unit with a 2 GB format limit — the writable side of this
    engine is always the broadcast-sized one. Rows are ordered by
    ``sort_col`` (default: first attribute column) so output bytes are
    partition-count-independent. Returns the row count."""
    from ..geom.model import parse_wkt as _parse_wkt
    from ..geom.shapefile import write_shapefile

    pdf = df.toPandas()
    attr_cols = [c for c in pdf.columns if c != wkt_col]
    order = sort_col or (attr_cols[0] if attr_cols else None)
    if order is not None:
        pdf = pdf.sort_values(order, ignore_index=True)
    geoms = [_parse_wkt(w) for w in pdf[wkt_col]]
    out_dir = os.path.dirname(path_no_ext)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    write_shapefile(path_no_ext, pdf[attr_cols], geoms)
    return len(pdf)
