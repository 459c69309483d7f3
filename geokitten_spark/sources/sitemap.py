"""Sitemap lane — render, parse, and reconcile XML sitemaps
(sitemaps.org protocol 0.9: <urlset>/<url>/<loc>/<lastmod>, plus
<sitemapindex> for the two-level form).

Together with the robots.txt lane (`functions/robots.py`) and the CDX
lane (`sources/cdx.py`) this completes the crawl-control surface: a
frontier scheduler needs "what does the site SAY it has" (sitemap) vs
"what did we actually capture" (crawl/CDX) — the reconciliation yields
the recrawl frontier (listed-but-uncrawled) and the ghost set
(crawled-but-unlisted).

Scale shape: render is one groupBy(host) aggregate over codegen-built
entry strings (array_sort for byte determinism); parse is 100%
Catalyst regexp over the XML (entry split, then per-entry field
extraction — one map stage, no Python); the frontier reconciliation is
ONE full-outer join on (host, url) followed by a per-host aggregate,
and both sides carry (host, url, lastmod) only — never page bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "render_sitemaps",
    "parse_urlset",
    "parse_sitemapindex",
    "sitemap_frontier",
]

_XML_HEAD = '<?xml version="1.0" encoding="UTF-8"?>'
_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def render_sitemaps(urls: DataFrame, *, host_col: str = "host",
                    url_col: str = "url", lastmod_col: str = "lastmod") -> DataFrame:
    """(host, url, lastmod) rows -> one <urlset> XML document per host,
    entries sorted by url for byte determinism. Returns (host, xml)."""
    entry = F.concat(
        F.lit("<url><loc>"), F.col(url_col),
        F.lit("</loc><lastmod>"), F.col(lastmod_col),
        F.lit("</lastmod></url>"),
    )
    return (
        urls.select(F.col(host_col).alias("host"), entry.alias("e"))
        .groupBy("host")
        .agg(F.array_sort(F.collect_list("e")).alias("es"))
        .select(
            "host",
            F.concat(
                F.lit(_XML_HEAD),
                F.lit(f'<urlset xmlns="{_NS}">'),
                F.array_join("es", ""),
                F.lit("</urlset>"),
            ).alias("xml"),
        )
    )


def _entries(xml_col: str, container: str, entry_tag: str):
    body = F.regexp_extract(
        F.col(xml_col), rf"(?s)<{container}[^>]*>(.*)</{container}>", 1
    )
    return F.regexp_extract_all(
        body, F.lit(rf"(?s)<{entry_tag}>(.*?)</{entry_tag}>"), F.lit(1)
    )


def parse_urlset(sitemaps: DataFrame, *, xml_col: str = "xml") -> DataFrame:
    """(host, xml) -> exploded (host, loc, lastmod) — pure Catalyst
    regexp (entry scan, then per-entry field extraction)."""
    e = F.explode(_entries(xml_col, "urlset", "url")).alias("e")
    out = sitemaps.select("host", e)
    return out.select(
        "host",
        F.regexp_extract("e", r"<loc>([^<]*)</loc>", 1).alias("loc"),
        F.regexp_extract("e", r"<lastmod>([^<]*)</lastmod>", 1).alias("lastmod"),
    )


def parse_sitemapindex(indexes: DataFrame, *, xml_col: str = "xml") -> DataFrame:
    """(host, xml) -> exploded (host, child_loc) for the two-level form."""
    e = F.explode(_entries(xml_col, "sitemapindex", "sitemap")).alias("e")
    return indexes.select("host", e).select(
        "host", F.regexp_extract("e", r"<loc>([^<]*)</loc>", 1).alias("child_loc")
    )


def sitemap_frontier(listed: DataFrame, crawled: DataFrame) -> DataFrame:
    """Reconcile what the site lists vs what the crawl captured.

    ``listed``: (host, loc, lastmod); ``crawled``: (host, url). ONE
    full-outer join on (host, url) + one per-host aggregate — the join
    is host-qualified because cross-host sitemap entries are legal: the
    same URL string listed by host A but crawled under host B must count
    as A's frontier and B's ghost, not as matched for both. Returns
    (host, n_listed, n_crawled, n_new, n_stale, latest_lastmod) where
    n_new = listed but never crawled (the recrawl frontier) and
    n_stale = crawled but not listed (the ghost set)."""
    left = listed.select("host", F.col("loc").alias("u"), "lastmod",
                         F.lit(1).alias("__l"))
    right = crawled.select("host", F.col("url").alias("u"),
                           F.lit(1).alias("__c"))
    j = left.join(right, ["host", "u"], "full_outer")
    return (
        j.select(
            "host",
            F.coalesce("__l", F.lit(0)).alias("l"),
            F.coalesce("__c", F.lit(0)).alias("c"),
            "lastmod",
        )
        .groupBy("host")
        .agg(
            F.sum("l").cast("bigint").alias("n_listed"),
            F.sum("c").cast("bigint").alias("n_crawled"),
            F.sum(((F.col("l") == 1) & (F.col("c") == 0)).cast("int"))
            .cast("bigint")
            .alias("n_new"),
            F.sum(((F.col("c") == 1) & (F.col("l") == 0)).cast("int"))
            .cast("bigint")
            .alias("n_stale"),
            F.max("lastmod").alias("latest_lastmod"),
        )
    )
