"""CDXJ crawl-index lane: SURT url keys + index line render/parse.

Common Crawl publishes its per-crawl URL index as CDXJ text: one line per
capture, ``<SURT urlkey> <14-digit timestamp> <JSON block>`` where the
JSON carries url/status/digest/filename/offset/length. Pipelines use it
to locate captures without scanning WARCs; this module gives the engine
both directions as PURE CATALYST column expressions (no UDF — and every
expression has a DuckDB twin, so the whole lane is oracle-checkable):

* :func:`surt_key` — URL → SURT (Sort-friendly URI Reordering Transform)
  key: host labels reversed and comma-joined, ``www.`` dropped, lowercase,
  ``)`` then the path — the property that makes one host's captures
  lexicographically contiguous, which is WHY the index sorts by it (range
  scans per host/domain become partition-prunable at scale).
* :func:`cdxj_line` — (url, warc_ts, html…) → the index line.
* :func:`parse_cdxj` — index line → (urlkey, ts, url, status, digest,
  length) columns via one codegen pass (``split`` limit 3 +
  ``get_json_object``).
* :func:`read_cdxj_dir` — ``spark.read.text`` over ``*.cdx*`` files +
  :func:`parse_cdxj`; blank/malformed lines drop via null filtering.

Scale shape: everything here is whole-stage codegen over text lines; a
crawl's index (~10^10 lines) scans, filters, and joins like any columnar
table, and the SURT key is the natural sort/partition column (Common
Crawl itself shards the index into 300 SURT ranges).

Reference parity: none — north_rule (Common-Crawl pipeline) surface,
sibling of the WARC and robots lanes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "surt_key",
    "surt_key_sql",
    "cdxj_line",
    "cdxj_line_sql",
    "parse_cdxj",
    "read_cdxj_dir",
    "latest_captures",
    "crawl_delta",
]


def surt_key(url: Column) -> Column:
    """URL → SURT key: ``https://www.Host.Example/a/b`` →
    ``example,host)/a/b`` (labels reversed, lowercased, www-stripped)."""
    host = F.lower(F.regexp_extract(url, r"^[a-z]+://([^/]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(url, r"^[a-z]+://[^/]+(/.*)?$", 1)
    rev = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    return F.concat(rev, F.lit(")"), F.when(path == "", "/").otherwise(path))


def surt_key_sql(url_expr: str) -> str:
    host = f"lower(regexp_extract({url_expr}, '^[a-z]+://([^/]+)', 1))"
    host = f"regexp_replace({host}, '^www\\.', '')"
    path = f"regexp_extract({url_expr}, '^[a-z]+://[^/]+(/.*)?$', 1)"
    rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    return (
        f"({rev} || ')' || CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
    )


def cdxj_line(url: Column, warc_ts: Column, html: Column,
              filename: Column, status: Column = None) -> Column:
    """The CDXJ index line: ``urlkey timestamp {json}`` with the JSON in
    the field order Common Crawl emits (url, mime, status, digest,
    length, filename). Digest is the md5 of the stored payload (stand-in
    for CC's SHA-1 — same role, available in both engines)."""
    if status is None:
        status = F.lit(200)
    ts14 = F.date_format(warc_ts, "yyyyMMddHHmmss")
    js = F.concat(
        F.lit('{"url": "'), url,
        F.lit('", "mime": "text/html", "status": "'),
        status.cast("string"),
        F.lit('", "digest": "'), F.md5(html.cast("binary")),
        F.lit('", "length": "'), F.length(html.cast("binary")).cast("string"),
        F.lit('", "filename": "'), filename, F.lit('"}'),
    )
    return F.concat_ws(" ", surt_key(url), ts14, js)


def cdxj_line_sql(url: str, doc_ts: str, html: str, filename: str) -> str:
    """The identical line in DuckDB SQL (strftime + strlen + md5)."""
    ts14 = f"strftime({doc_ts}, '%Y%m%d%H%M%S')"
    js = (
        "('{\"url\": \"' || " + url + " || '\", \"mime\": \"text/html\", "
        "\"status\": \"200\", \"digest\": \"' || md5(" + html + ") || "
        "'\", \"length\": \"' || CAST(strlen(" + html + ") AS VARCHAR) || "
        "'\", \"filename\": \"' || " + filename + " || '\"}')"
    )
    return f"({surt_key_sql(url)} || ' ' || {ts14} || ' ' || {js})"


def parse_cdxj(lines: DataFrame, col: str = "value") -> DataFrame:
    """CDXJ lines → typed columns in one codegen pass. Malformed lines
    (no 3 fields / bad JSON) yield nulls and are dropped."""
    parts = F.split(F.col(col), " ", 3)
    # F.get (not getItem): out-of-bounds → NULL under ANSI mode, so short/
    # blank lines drop instead of failing the task
    js = F.get(parts, 2)
    out = lines.select(
        F.get(parts, 0).alias("urlkey"),
        F.try_to_timestamp(F.get(parts, 1), F.lit("yyyyMMddHHmmss")).alias(
            "capture_ts"
        ),
        F.get_json_object(js, "$.url").alias("url"),
        F.get_json_object(js, "$.status").cast("int").alias("status"),
        F.get_json_object(js, "$.digest").alias("digest"),
        F.get_json_object(js, "$.length").cast("long").alias("length"),
        F.get_json_object(js, "$.filename").alias("filename"),
    )
    return out.filter(
        F.col("urlkey").isNotNull()
        & F.col("capture_ts").isNotNull()
        & F.col("url").isNotNull()
    )


def read_cdxj_dir(spark: SparkSession, path: str,
                  glob: str = "*.cdx*") -> DataFrame:
    """Distributed CDXJ scan: plain text source (line-splittable — unlike
    the WARC scan this parallelizes WITHIN files too) + one parse pass."""
    return parse_cdxj(
        spark.read.option("pathGlobFilter", glob).text(path)
    )


# ---------------------------------------------------------------------------
# crawl deltas — the standard operation over two crawl indexes
# ---------------------------------------------------------------------------


def latest_captures(captures: DataFrame) -> DataFrame:
    """Latest-capture election: one row per urlkey carrying the most
    recent capture's digest and url. A crawl index holds every capture
    of a url (recrawls, retries); diffing two crawls is only meaningful
    over each side's newest capture.

    Ties on ``ts`` (two captures of a urlkey in the same second — real
    indexes have them) are broken deterministically: the election key is
    the struct (ts, digest, url), so the lexicographically greatest
    capture wins and digest/url always come from the SAME row.

    Scale shape: a single hash aggregation on ``urlkey`` with map-side
    partial ``max``/``max_by`` combine — duplicate captures of a url
    collapse before the shuffle, so the exchange carries one row per
    (partition, urlkey)."""
    agg = captures.groupBy("urlkey").agg(
        F.max("ts").alias("ts"),
        F.max_by(
            F.struct("digest", "url"), F.struct("ts", "digest", "url")
        ).alias("_elected"),
    )
    return agg.select(
        "urlkey",
        "ts",
        F.col("_elected.digest").alias("digest"),
        F.col("_elected.url").alias("url"),
    )


def crawl_delta(a: DataFrame, b: DataFrame) -> DataFrame:
    """Recrawl diff between two capture tables (urlkey, ts, url, digest):
    classify every url as ``added`` (only in b), ``removed`` (only in
    a), ``changed`` (both, content digest differs), or ``unchanged``.

    This is the Common-Crawl-index counterpart of an incremental-ingest
    plan: crawl N vs crawl N+1 decides what to (re)process downstream —
    the added+changed set is the work list, removed feeds tombstones.

    Scale shape: latest-capture election on each side (map-combined hash
    aggs), then ONE full-outer shuffle join on ``urlkey`` whose exchange
    rows carry only (urlkey, 32-hex digest, url) — never page payloads;
    the status derivation is a codegen CASE. urlkeys are near-unique per
    side so the join has no skew; at index scale both sides are already
    SURT-sorted, so a real deployment bucket-partitions both indexes by
    urlkey range and this join co-locates without a shuffle."""
    la = latest_captures(a).select(
        "urlkey",
        F.col("digest").alias("digest_a"),
        F.col("url").alias("url_a"),
    )
    lb = latest_captures(b).select(
        "urlkey",
        F.col("digest").alias("digest_b"),
        F.col("url").alias("url_b"),
    )
    j = la.join(lb, "urlkey", "full_outer")
    status = (
        F.when(F.col("digest_a").isNull(), F.lit("added"))
        .when(F.col("digest_b").isNull(), F.lit("removed"))
        .when(F.col("digest_a") == F.col("digest_b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "urlkey",
        F.coalesce("url_b", "url_a").alias("url"),
        status.alias("status"),
        "digest_a",
        "digest_b",
    )
