"""Deterministic synthetic fixtures (FIXTURES.md) — no external data.

Two kinds:

* ``web_documents``: the Common-Crawl-shaped view (url, warc_ts, html, text,
  lang) derived 1:1 from the driver's ``documents.parquet`` by pure SQL
  expressions — the SAME derivation exists in DuckDB SQL (``*_sql``
  helpers) so every downstream operator is oracle-checkable.
* driver-side generated pandas frames (admin polygons, geometry cases, KML
  corpus): small boundary-style tables seeded with ``numpy`` seed 42,
  created once per session and broadcast/parallelized.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.geocode import (
    url_from_doc_id,
    url_from_doc_id_sql,
    geo_lon,
    geo_lat,
    geo_lon_sql,
    geo_lat_sql,
)

__all__ = [
    "web_documents",
    "web_documents_sql",
    "neardup_corpus",
    "neardup_corpus_cte",
    "embedding_neardup_corpus",
    "embedding_neardup_corpus_cte",
    "admin_polygons_pdf",
    "admin_polygons",
    "admin_rects_sql_parts",
    "geometry_cases_pdf",
    "kml_corpus",
]


# ---------------------------------------------------------------------------
# web_documents view (Spark + DuckDB twin derivations)
# ---------------------------------------------------------------------------

_SECONDS_PER_YEAR = 31_536_000

# link-graph constants: every page carries N_LINKS <link href="doc://T">
# elements in <head>; targets are a pure per-row function of doc_id with a
# FIXED modulus (doc_ids 0..499 exist at every SF), so the derivation stays
# streaming-safe (no corpus count) and identical in DuckDB SQL
LINK_MULT = 7919
LINK_STEP = 104_729
LINK_DOMAIN = 500
N_LINKS = 3


def link_target(doc_id, k: int):
    """k-th (1-based) link target of a page as a Spark Column."""
    return (doc_id * LINK_MULT + LINK_STEP * k) % LINK_DOMAIN


def link_target_sql(doc_id: str, k: int) -> str:
    return f"(({doc_id}) * {LINK_MULT} + {LINK_STEP * k}) % {LINK_DOMAIN}"


def _head_links(doc_id):
    parts = []
    for k in range(1, N_LINKS + 1):
        parts += [
            F.lit('<link href="doc://'),
            link_target(doc_id, k).cast("string"),
            F.lit('">'),
        ]
    return parts


def head_links_sql(doc_id: str = "doc_id") -> str:
    """The same three <link> tags as one SQL string expression."""
    return " || ".join(
        f"'<link href=\"doc://' || CAST({link_target_sql(doc_id, k)} AS VARCHAR) || '\">'"
        for k in range(1, N_LINKS + 1)
    )


def host_robots_fixture() -> list:
    """Deterministic robots.txt per fixture host (urls spread over 97
    hosts): every host's ``*`` group disallows one language directory
    with a longest-match Allow carve-back for low-numbered pages; every
    4th host adds a bot-specific group (wildcard + ``$``-anchored rule)
    that REPLACES the ``*`` group per RFC 9309 group selection; every
    7th host includes an ignored directive mid-group; every 3rd host
    publishes a ``Sitemap:`` line (every 9th, two) — group-independent
    per RFC 9309, skipped by the rule parser, surfaced by
    ``sitemap_directives``."""
    langs = ["en", "es", "de", "fr", "pt"]
    out = []
    for h in range(97):
        lang = langs[h % 5]
        lines = [
            "# fixture robots",
            "User-agent: *",
            f"Disallow: /{lang}",
            f"Allow: /{lang}/page-00000",
        ]
        if h % 7 == 2:
            lines.append("Crawl-delay: 10")  # skipped directive
            lines.append(f"Disallow: /{langs[(h + 1) % 5]}/page-0000003$")
        if h % 4 == 1:
            lines += [
                "",
                "User-agent: geokittenbot",
                "Disallow: /*/page-*9$",
            ]
        if h % 3 == 0:
            lines.append(f"Sitemap: https://host{h}.example/sitemap.xml")
        if h % 9 == 0:
            lines.append(f"Sitemap: https://host{h}.example/sitemap-news.xml")
        out.append((f"host{h}.example", "\n".join(lines) + "\n"))
    return out


def link_edges_sql() -> str:
    """The formula-derived (src, dst) edge list over `documents` — MUST
    equal what operators.linkgraph.extract_links parses out of the html
    column (the oracle's independence check on the extraction path)."""
    return " UNION ALL ".join(
        f"SELECT doc_id AS src, CAST({link_target_sql('doc_id', k)} AS BIGINT) AS dst"
        " FROM documents"
        for k in range(1, N_LINKS + 1)
    )


def web_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → input_hint-shaped table with geocode columns.

    Columns: doc_id, url, warc_ts, html (binary), text (title+\\n+body),
    lang, lon, lat. ``extract(html) == text`` holds byte-for-byte.
    """
    return derive_web_documents(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def derive_web_documents(docs: DataFrame) -> DataFrame:
    """The webdocs derivation as pure column expressions over a documents
    table — works identically on a BATCH or a STREAMING DataFrame (the
    geocode is codegen, no stateful ops), which is what lets the flagship
    tiling run incrementally (q_stream_geo_tiles)."""
    title = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
    page_text = F.concat(title, F.lit("\n"), F.col("text"))
    html = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title>"),
        *_head_links(F.col("doc_id")),
        F.lit("</head><body><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    ).cast("binary")
    url = url_from_doc_id(F.col("doc_id"), F.col("lang"))
    return (
        docs.select(
            "doc_id",
            url.alias("url"),
            (
                F.to_timestamp(F.lit("2025-01-01 00:00:00"))
                + F.make_interval(secs=(F.col("doc_id") * 137) % _SECONDS_PER_YEAR)
            ).alias("warc_ts"),
            html.alias("html"),
            page_text.alias("text"),
            "lang",
        )
        .withColumn("lon", geo_lon(F.col("url")))
        .withColumn("lat", geo_lat(F.col("url")))
    )


def web_documents_sql() -> str:
    """DuckDB CTE body producing the identical table from view `documents`."""
    url = url_from_doc_id_sql("doc_id", "lang")
    return f"""
        SELECT
            doc_id,
            {url} AS url,
            TIMESTAMP '2025-01-01 00:00:00' + INTERVAL (CAST((doc_id * 137) % {_SECONDS_PER_YEAR} AS BIGINT)) SECOND AS warc_ts,
            ('Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || text) AS text,
            lang,
            {geo_lon_sql(url)} AS lon,
            {geo_lat_sql(url)} AS lat
        FROM documents
    """


# ---------------------------------------------------------------------------
# near-dup corpora — documents/embeddings ∪ deterministically mutated copies
# (the driver tables contain no near-duplicates; these twins inject known
# positives so dedup operators have something to find, identically in both
# engines)
# ---------------------------------------------------------------------------

_NEARDUP_TAIL = " near dup tail marker"
_NEARDUP_STRIDE = 10
_NEARDUP_ID_OFFSET = 1_000_000


def crawl_snapshots(spark: SparkSession, sf_dir: str):
    """Two deterministic crawl-index snapshots (urlkey, ts, url, digest)
    for the recrawl-diff lane, derived purely from ``web_documents``:

    * crawl A holds every url except ``doc_id % 11 == 3`` (those become
      ``added`` in B);
    * crawl B holds every url except ``doc_id % 11 == 7`` (``removed``),
      30 days later, with the page content CHANGED when
      ``doc_id % 5 == 0`` (digest differs → ``changed``);
    * B additionally carries a STALE duplicate capture (15 days, the
      unchanged content) for ``doc_id % 13 == 2`` — latest-capture
      election must pick the 30-day capture or the changed/unchanged
      classification flips.

    SQL twin: :func:`crawl_snapshots_sql`."""
    from geokitten_spark.sources.cdx import surt_key

    docs = web_documents(spark, sf_dir)
    digest = F.md5(F.col("html").cast("binary"))
    a = docs.filter(F.col("doc_id") % 11 != 3).select(
        surt_key(F.col("url")).alias("urlkey"),
        F.col("warc_ts").alias("ts"),
        "url",
        digest.alias("digest"),
    )
    changed_digest = F.when(
        F.col("doc_id") % 5 == 0,
        F.md5(F.concat(F.col("html").cast("string"), F.lit("<!-- rev2 -->"))),
    ).otherwise(digest)
    base_b = docs.filter(F.col("doc_id") % 11 != 7)
    b = base_b.select(
        surt_key(F.col("url")).alias("urlkey"),
        (F.col("warc_ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        "url",
        changed_digest.alias("digest"),
    ).unionByName(
        base_b.filter(F.col("doc_id") % 13 == 2).select(
            surt_key(F.col("url")).alias("urlkey"),
            (F.col("warc_ts") + F.expr("INTERVAL 15 DAYS")).alias("ts"),
            "url",
            digest.alias("digest"),
        )
    )
    return a, b


def crawl_snapshots_sql() -> str:
    """DuckDB CTE bodies (``ca``/``cb``) twinning :func:`crawl_snapshots`;
    prepend after a ``w`` CTE shaped like :func:`web_documents_sql` with
    an ``html`` column."""
    from geokitten_spark.sources.cdx import surt_key_sql

    key = surt_key_sql("url")
    return f"""
        ca AS (
            SELECT {key} AS urlkey, ts, url, md5(html) AS digest
            FROM w WHERE doc_id % 11 <> 3
        ),
        cb AS (
            SELECT {key} AS urlkey, ts + INTERVAL 30 DAY AS ts, url,
                   md5(CASE WHEN doc_id % 5 = 0
                            THEN html || '<!-- rev2 -->' ELSE html END)
                       AS digest
            FROM w WHERE doc_id % 11 <> 7
            UNION ALL
            SELECT {key} AS urlkey, ts + INTERVAL 15 DAY AS ts, url,
                   md5(html) AS digest
            FROM w WHERE doc_id % 11 <> 7 AND doc_id % 13 = 2
        )
    """


def neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ suffix-mutated copies of every 10th doc (id + 1e6).

    Repartitioned up front: the source is a single parquet file (one input
    split), which would otherwise serialize every downstream md5-heavy
    minhash/simhash pipeline into one task."""
    n_parts = max(8, spark.sparkContext.defaultParallelism)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(n_parts, "doc_id")
    )
    mut = docs.filter(F.col("doc_id") % _NEARDUP_STRIDE == 0).select(
        (F.col("doc_id") + _NEARDUP_ID_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_NEARDUP_TAIL)).alias("text"),
    )
    return docs.unionByName(mut)


def neardup_corpus_cte() -> str:
    """DuckDB CTE body `corpus AS (...)` producing the identical table."""
    return f"""corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {_NEARDUP_ID_OFFSET} AS doc_id,
               text || '{_NEARDUP_TAIL}' AS text
        FROM documents WHERE doc_id % {_NEARDUP_STRIDE} = 0
    )"""


def embedding_neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ perturbed copies of every 10th vector (first component
    scaled 1.05 AFTER the float→double cast, so both engines see identical
    doubles)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    mut = emb.filter(F.col("vec_id") % _NEARDUP_STRIDE == 0).select(
        (F.col("vec_id") + _NEARDUP_ID_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, x * 1.05).otherwise(x),
        ).alias("embedding"),
    )
    return emb.unionByName(mut)


def embedding_neardup_corpus_cte() -> str:
    return f"""ecorpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
        UNION ALL
        SELECT vec_id + {_NEARDUP_ID_OFFSET} AS vec_id,
               list_transform(generate_series(1, len(v)),
                              i -> CASE WHEN i = 1 THEN v[i] * 1.05 ELSE v[i] END) AS embedding
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        WHERE vec_id % {_NEARDUP_STRIDE} = 0
    )"""


# ---------------------------------------------------------------------------
# admin_polygons (FIXTURES.md §3) — 200 jittered hexagons, seed 42
# ---------------------------------------------------------------------------

def _hex_ring(cx, cy, r, jit):
    pts = []
    for v in range(6):
        a = v * math.pi / 3.0
        rr = r * (1.0 + 0.15 * jit[v])
        pts.append((cx + rr * math.cos(a), cy + rr * math.sin(a)))
    pts.append(pts[0])
    return pts


def _ring_wkt(pts):
    return "(" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts) + ")"


def admin_polygons_pdf(n_rows: int = 200) -> pd.DataFrame:
    """Deterministic admin boundary set (seed 42, pure function of row idx).

    Layout: 20×10 grid over lon∈[-171,171], lat∈[-53.5,63.5]; radius
    0.05–0.5°; every 10th row MULTIPOLYGON (2 parts); every 7th row one
    interior ring; rows (2k, 2k+1) k<10 overlap by construction."""
    rng = np.random.default_rng(42)
    jitters = rng.uniform(-1.0, 1.0, size=(n_rows, 12))
    rows = []
    centers = []
    for i in range(n_rows):
        cx = -180.0 + (i % 20) * 18.0 + 9.0
        cy = -60.0 + (i // 20) * 13.0 + 6.5
        centers.append((cx, cy))
    # overlap pairs: odd member moves next to its even partner
    radii = [0.05 + ((i * 7919) % 1000) / 1000.0 * 0.45 for i in range(n_rows)]
    for k in range(10):
        a, b = 2 * k, 2 * k + 1
        ox = 0.5 * min(radii[a], radii[b])
        centers[b] = (centers[a][0] + ox, centers[a][1] + 0.5 * ox)
    for i in range(n_rows):
        cx, cy = centers[i]
        r = radii[i]
        ext = _hex_ring(cx, cy, r, jitters[i, :6])
        rings = [_ring_wkt(ext)]
        if i % 7 == 0:
            hole = _hex_ring(cx, cy, r * 0.3, jitters[i, 6:12])
            rings.append(_ring_wkt(hole[::-1]))
        poly = "POLYGON (" + ", ".join(rings) + ")"
        if i % 10 == 0:
            cx2, cy2 = cx + 1.5 * r, cy + 1.5 * r
            part2 = _ring_wkt(_hex_ring(cx2, cy2, r * 0.4, jitters[i, 6:12]))
            poly = (
                "MULTIPOLYGON ((" + ", ".join(rings) + "), (" + part2 + "))"
            )
        rows.append(
            {
                "region_id": f"{5001000000 + i}",
                "name": f"Region-{i:04d}",
                "depto_id": i // 25,
                "population": 1000 + (i * 7919) % 2_000_000,
                "region": f"zone-{i % 8}",
                "geometry_wkt": poly,
                "crs": "EPSG:4326",
            }
        )
    return pd.DataFrame(rows)


def admin_polygons(spark: SparkSession, n_rows: int = 200) -> DataFrame:
    return spark.createDataFrame(admin_polygons_pdf(n_rows))


# ---------------------------------------------------------------------------
# admin rectangles derived from `nation` — the SQL-oracle-able PIP fixture
# ---------------------------------------------------------------------------

# bounds carry a +5e-7 offset: geocoded lon/lat are rounded to 6 decimals,
# so no point can ever lie exactly ON a rectangle edge — making ray-casting
# PIP and the oracle's strict bbox predicates provably agree
_RECT_EPS = 0.0000005


def admin_rects_sql_parts() -> dict:
    """Rectangle bounds as SQL expressions over nation(n_nationkey) — usable
    verbatim in Spark SQL and DuckDB. 25 disjoint rectangles covering the
    geocode lon/lat domain."""
    return {
        "lon0": f"(-170.0 + (n_nationkey % 5) * 70.0 + {_RECT_EPS})",
        "lon1": f"(-170.0 + (n_nationkey % 5) * 70.0 + 50.0 + {_RECT_EPS})",
        "lat0": f"(-55.0 + CAST(FLOOR(n_nationkey / 5) AS BIGINT) * 25.0 + {_RECT_EPS})",
        "lat1": f"(-55.0 + CAST(FLOOR(n_nationkey / 5) AS BIGINT) * 25.0 + 18.0 + {_RECT_EPS})",
    }


def admin_rects_pdf() -> pd.DataFrame:
    """The same 25 rectangles materialized as WKT polygons (drives the real
    R-tree/ray-casting PIP machinery; results must equal the SQL bbox join)."""
    rows = []
    for key in range(25):
        lon0 = -170.0 + (key % 5) * 70.0 + _RECT_EPS
        lon1 = lon0 + 50.0
        lat0 = -55.0 + (key // 5) * 25.0 + _RECT_EPS
        lat1 = lat0 + 18.0
        wkt = (
            f"POLYGON (({lon0:.7f} {lat0:.7f}, {lon0:.7f} {lat1:.7f}, "
            f"{lon1:.7f} {lat1:.7f}, {lon1:.7f} {lat0:.7f}, {lon0:.7f} {lat0:.7f}))"
        )
        rows.append({"n_nationkey": key, "geometry_wkt": wkt})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# bench boundaries — 200 world-covering jittered 24-gons (seed 42)
# ---------------------------------------------------------------------------

def bench_boundaries_pdf(n_cols: int = 20, n_rows: int = 10, n_vertices: int = 24) -> pd.DataFrame:
    """Realistic admin-boundary proxy for the flagship bench: 200 large
    overlapping 24-vertex polygons tiling the geocode domain, so nearly
    every doc point hits 1-4 candidate polygons and each PIP test ray-casts
    ~24 edges (the north_rule's 'admin-boundary polygon broadcast' shape)."""
    rng = np.random.default_rng(42)
    rows = []
    for i in range(n_cols * n_rows):
        cx = -180.0 + (i % n_cols) * (360.0 / n_cols) + 180.0 / n_cols
        cy = -60.0 + (i // n_cols) * (130.0 / n_rows) + 65.0 / n_rows
        base_r = 1.3 * 180.0 / n_cols  # overlap neighbors
        jit = rng.uniform(0.8, 1.2, size=n_vertices)
        pts = []
        for v in range(n_vertices):
            a = 2.0 * math.pi * v / n_vertices
            r = base_r * jit[v]
            pts.append((cx + r * math.cos(a), cy + 0.72 * r * math.sin(a)))
        pts.append(pts[0])
        rows.append(
            {
                "region_key": i,
                "geometry_wkt": "POLYGON (" + _ring_wkt(pts) + ")",
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# geometry parity corpus (FIXTURES.md §4)
# ---------------------------------------------------------------------------

def geometry_cases_pdf() -> pd.DataFrame:
    cases = [
        ("unit_square", "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
        (
            "square_with_hole",
            "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (3 3, 3 7, 7 7, 7 3, 3 3))",
        ),
        (
            "square_with_hole_z",
            "POLYGON Z ((0 0 1, 0 10 1, 10 10 1, 10 0 1, 0 0 1), (3 3 1, 3 7 1, 7 7 1, 7 3 1, 3 3 1))",
        ),
        ("polygon_z", "POLYGON Z ((0 0 1, 0 1 1, 1 1 1, 1 0 1, 0 0 1))"),
        (
            "multipolygon_z",
            "MULTIPOLYGON Z (((0 0 1, 0 1 1, 1 1 1, 1 0 1, 0 0 1)), ((2 2 1, 2 3 1, 3 3 1, 3 2 1, 2 2 1)))",
        ),
        ("bowtie_invalid", "POLYGON ((0 0, 1 1, 0 1, 1 0, 0 0))"),
        ("bowtie_invalid_large", "POLYGON ((0 0, 10 10, 0 10, 10 0, 0 0))"),
        ("empty_polygon", "POLYGON EMPTY"),
        ("point_z", "POINT (0 0 1)"),
        ("linear_ring", "LINEARRING (0 0, 0 1, 1 1, 1 0, 0 0)"),
        (
            "ring_collection",
            "GEOMETRYCOLLECTION (LINEARRING (0 0, 0 1, 1 1, 1 0, 0 0), LINEARRING (2 2, 2 3, 3 3, 3 2, 2 2))",
        ),
        ("overlap_pair_target", "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))"),
        ("overlap_pair_sub", "POLYGON ((2 2, 2 6, 6 6, 6 2, 2 2))"),
    ]
    return pd.DataFrame(cases, columns=["case_id", "wkt"])


# ---------------------------------------------------------------------------
# KML corpus (FIXTURES.md §5) — OGC-namespace inputs from admin rows 0-5
# ---------------------------------------------------------------------------

def kml_corpus() -> pd.DataFrame:
    """6 single-placemark OGC-ns KML files named like the reference fixtures
    (tests/tests_files/inputs/gdf_kml_converter/)."""
    from .geom import parse_wkt

    admin = admin_polygons_pdf()
    rows = []
    for i in range(6):
        g = parse_wkt(admin.loc[i, "geometry_wkt"])
        ext = g.parts[0][0]
        coords = " ".join(f"{x},{y}" for x, y in np.asarray(ext)[:, :2])
        name = f"{5001010100 + i:011d}"
        kml = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<kml xmlns="http://www.opengis.net/kml/2.2">\n'
            "  <Folder>\n"
            f"    <name>{name}</name>\n"
            "    <Placemark>\n"
            f"      <name>{name}</name>\n"
            "      <Polygon>\n"
            "        <outerBoundaryIs>\n"
            "          <LinearRing>\n"
            f"            <coordinates>{coords}</coordinates>\n"
            "          </LinearRing>\n"
            "        </outerBoundaryIs>\n"
            "      </Polygon>\n"
            "    </Placemark>\n"
            "  </Folder>\n"
            "</kml>\n"
        )
        rows.append({"file_name": f"{name}.kml", "kml_bytes": kml.encode("utf-8")})
    return pd.DataFrame(rows)
