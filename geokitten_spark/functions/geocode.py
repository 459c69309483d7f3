"""Deterministic URL geocoding — pure Spark SQL columns (no UDF).

The north_star geocodes each document's URL to a point before the
admin-boundary PIP join. Per FIXTURES.md §2, the geocode is a pure function
of the url (md5-based), so it is (a) reproducible on resume/retry, (b)
entirely JVM-side (whole-stage codegen, no Python), and (c) expressible in
identical form in DuckDB for the correctness oracle.

lon = round((int(md5(url)[0:8], 16)  / 0xFFFFFFFF) * 360 − 180, 6)
lat = round((int(md5(url)[8:16], 16) / 0xFFFFFFFF) * 140 − 60, 6)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "url_from_doc_id",
    "url_from_doc_id_sql",
    "geo_lon",
    "geo_lat",
    "geo_lon_sql",
    "geo_lat_sql",
    "url_host",
    "url_host_sql",
    "url_path",
    "url_path_sql",
    "haversine_km",
    "haversine_km_sql",
    "url_canonicalize",
    "url_canonicalize_sql",
]

_MAX32 = 4294967295.0  # 0xFFFFFFFF


def url_from_doc_id(doc_id: Column, lang: Column) -> Column:
    """Synthesize the Common-Crawl-style url for the sandbox `documents`
    table (FIXTURES.md §1 shape) from (doc_id, lang) — deterministic."""
    return F.concat(
        F.lit("https://host"),
        (doc_id % 97).cast("string"),
        F.lit(".example/"),
        lang,
        F.lit("/page-"),
        F.lpad(doc_id.cast("string"), 7, "0"),
    )


def url_from_doc_id_sql(doc_id: str = "doc_id", lang: str = "lang") -> str:
    """Same synthesis as ANSI SQL for the DuckDB oracle."""
    return (
        f"concat('https://host', CAST(({doc_id}) % 97 AS VARCHAR), '.example/', "
        f"{lang}, '/page-', lpad(CAST({doc_id} AS VARCHAR), 7, '0'))"
    )


def _hash_frac(url: Column, start: int) -> Column:
    # conv(hex, 16, 10) returns a decimal string; values fit in a BIGINT
    return F.conv(F.substring(F.md5(url), start, 8), 16, 10).cast("double") / F.lit(_MAX32)


def geo_lon(url: Column) -> Column:
    return F.round(_hash_frac(url, 1) * 360.0 - 180.0, 6)


def geo_lat(url: Column) -> Column:
    # 140°-span keeps points within S2/H3-friendly latitudes (FIXTURES §2)
    return F.round(_hash_frac(url, 9) * 140.0 - 60.0, 6)


def geo_lon_sql(url_expr: str) -> str:
    return (
        f"round((('0x' || substr(md5({url_expr}), 1, 8))::BIGINT / {_MAX32}) * 360.0 - 180.0, 6)"
    )


def geo_lat_sql(url_expr: str) -> str:
    return (
        f"round((('0x' || substr(md5({url_expr}), 9, 8))::BIGINT / {_MAX32}) * 140.0 - 60.0, 6)"
    )


# ---------------------------------------------------------------------------
# URL structure ops (per-domain pipeline aggregation) — regexp on BOTH
# engines (Spark's parse_url and DuckDB's url functions differ on edge
# cases; one shared regex guarantees oracle parity)
# ---------------------------------------------------------------------------

_HOST_RE = "^[a-z]+://([^/]+)"
_PATH_RE = "^[a-z]+://[^/]+(/[^?#]*)"


def url_host(url: Column) -> Column:
    """scheme://HOST/... → host (codegen regexp, no UDF)."""
    return F.regexp_extract(url, _HOST_RE, 1)


def url_host_sql(url_expr: str) -> str:
    return f"regexp_extract({url_expr}, '{_HOST_RE}', 1)"


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def url_path_sql(url_expr: str) -> str:
    return f"regexp_extract({url_expr}, '{_PATH_RE}', 1)"


# ---------------------------------------------------------------------------
# great-circle distance (pure Catalyst trig; identical formula in DuckDB)
# ---------------------------------------------------------------------------

_EARTH_R_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Haversine great-circle distance in km — whole-stage-codegen trig,
    no Python. Written term-for-term like ``haversine_km_sql`` so the two
    engines agree to float ulps (outputs should be rounded before
    hash-compare)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * _EARTH_R_KM) * F.asin(F.sqrt(a))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    dlat = f"radians(({lat2}) - ({lat1}))"
    dlon = f"radians(({lon2}) - ({lon1}))"
    a = (
        f"sin({dlat} / 2) * sin({dlat} / 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"sin({dlon} / 2) * sin({dlon} / 2)"
    )
    return f"{2.0 * _EARTH_R_KM} * asin(sqrt({a}))"


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-dedup key normalization)
# ---------------------------------------------------------------------------
# The web-pipeline primitive that precedes any URL-keyed dedup/join: the
# same resource crawled as HTTP://Example.COM:80/a?b=2&a=1#frag and
# http://example.com/a?a=1&b=2 must produce one key. Pure string
# expressions (Java-regex ∩ RE2 subset + split/array_sort), so the chain
# is whole-stage codegen in Spark AND byte-identical in the DuckDB twin.

def url_canonicalize(url: Column) -> Column:
    u = F.regexp_replace(url, r"#.*$", "")  # strip fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(host, r":(80|443)$", "")  # default ports
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    canon_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), canon_q)),
    )


def url_canonicalize_sql(url_expr: str) -> str:
    u = f"regexp_replace({url_expr}, '#.*$', '', 'g')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host_raw = f"lower(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"
    host = f"regexp_replace({host_raw}, ':(80|443)$', '', 'g')"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+', '', 'g')"
    path_raw = f"regexp_extract({rest}, '^([^?]*)', 1)"
    path = f"CASE WHEN {path_raw} = '' THEN '/' ELSE {path_raw} END"
    query = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    canon_q = f"array_to_string(list_sort(string_split({query}, '&')), '&')"
    return (
        f"({scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {query} = '' THEN '' ELSE '?' || {canon_q} END)"
    )
