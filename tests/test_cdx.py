"""CDXJ index lane (sources/cdx.py): SURT keys, line render/parse."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geokitten_spark.sources.cdx import (
    cdxj_line,
    parse_cdxj,
    read_cdxj_dir,
    surt_key,
    surt_key_sql,
)

URLS = [
    "https://www.Host.Example/a/b",
    "https://host9.example/en/page-0000009",
    "https://a.b.c.example/",
    "https://single/x",
    "https://no-path.example",
]
WANT_SURT = [
    "example,host)/a/b",
    "example,host9)/en/page-0000009",
    "example,c,b,a)/",
    "single)/x",
    "example,no-path)/",
]


def test_surt_key_fixed_points(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = [r.k for r in df.select(surt_key(F.col("url")).alias("k")).collect()]
    assert got == WANT_SURT


def test_surt_key_sql_twin_matches_spark():
    con = duckdb.connect()
    for u, want in zip(URLS, WANT_SURT):
        got = con.sql(
            f"SELECT {surt_key_sql(f'''{u!r}''')}"
        ).fetchone()[0]
        assert got == want, u


def test_line_render_parse_identity(spark):
    rows = [
        (1, "https://h.example/p", "2025-06-01 12:34:56",
         b"<html>x</html>", "f1.warc.gz"),
        (2, "https://h2.example/q/r", "2025-01-01 00:00:00",
         b"", "f2.warc.gz"),
    ]
    df = spark.createDataFrame(
        rows, "id long, url string, ts string, html binary, fn string"
    ).withColumn("ts", F.to_timestamp("ts"))
    lines = df.select(
        cdxj_line(F.col("url"), F.col("ts"), F.col("html"),
                  F.col("fn")).alias("value")
    )
    back = parse_cdxj(lines).collect()
    got = {r.url: r for r in back}
    assert len(got) == 2
    r = got["https://h.example/p"]
    assert r.urlkey == "example,h)/p"
    assert r.capture_ts.strftime("%Y%m%d%H%M%S") == "20250601123456"
    assert r.status == 200
    assert r.length == len(b"<html>x</html>")
    assert r.filename == "f1.warc.gz"
    assert got["https://h2.example/q/r"].length == 0


def test_malformed_lines_drop(spark):
    lines = spark.createDataFrame(
        [
            ("",),
            ("not enough fields",),
            ('key 20250101000000 {"broken json',),
            ('key notatimestamp {"url": "https://x/y"}',),
            ('example,h)/p 20250101000000 '
             '{"url": "https://h.example/p", "status": "200", '
             '"digest": "d", "length": "5", "filename": "f"}',),
        ],
        "value string",
    )
    out = parse_cdxj(lines).collect()
    assert len(out) == 1 and out[0].url == "https://h.example/p"


def test_read_cdxj_dir_roundtrip(spark, tmp_path):
    d = str(tmp_path / "cdx")
    import os

    os.makedirs(d)
    good = (
        'example,h)/p 20250101000000 '
        '{"url": "https://h.example/p", "status": "404", '
        '"digest": "abc", "length": "7", "filename": "f.warc.gz"}'
    )
    with open(os.path.join(d, "part-0.cdxj"), "w") as f:
        f.write(good + "\n\n")  # plus a blank line
    with open(os.path.join(d, "ignored.txt"), "w") as f:
        f.write("never read\n")
    rows = read_cdxj_dir(spark, d, glob="*.cdxj").collect()
    assert len(rows) == 1
    assert rows[0].status == 404 and rows[0].digest == "abc"


def test_parse_is_codegen_only(spark):
    lines = spark.createDataFrame([("k 20250101000000 {}",)], "value string")
    plan = parse_cdxj(lines)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "mapInPandas" not in plan.lower()


def test_crawl_delta_classification(spark):
    """Planted-status coverage: the fixture snapshots must produce all
    four statuses, with counts matching the planting formulas, and the
    stale duplicate capture must LOSE the latest-capture election."""
    from geokitten_spark.fixtures import crawl_snapshots
    from geokitten_spark.sources.cdx import crawl_delta
    from tests.conftest import SF_SMOKE

    a, b = crawl_snapshots(spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ids = [r.doc_id for r in docs.select("doc_id").collect()]

    def expected_status(i):
        in_a, in_b = i % 11 != 3, i % 11 != 7
        if not in_a:
            return "added" if in_b else None
        if not in_b:
            return "removed"
        return "changed" if i % 5 == 0 else "unchanged"

    want = {}
    for i in ids:
        s = expected_status(i)
        if s:
            want[s] = want.get(s, 0) + 1
    out = crawl_delta(a, b)
    got = {r.status: r["count"] for r in out.groupBy("status").count().collect()}
    assert got == want

    # the dup-capture urls (doc_id % 13 == 2, present in both crawls)
    # must classify by the 30-day capture: changed iff doc_id % 5 == 0
    dup_changed = sum(
        1 for i in ids
        if i % 13 == 2 and i % 11 not in (3, 7) and i % 5 == 0
    )
    n = out.filter((F.col("status") == "changed")
                   & F.col("urlkey").isin([
                       r.urlkey for r in a.join(
                           b.groupBy("urlkey").count().filter("count = 2"),
                           "urlkey").select("urlkey").distinct().collect()
                   ])).count()
    assert n == dup_changed


def test_latest_captures_tie_is_deterministic(spark):
    """Two captures of a urlkey sharing the max ts must elect a
    deterministic winner — the lexicographically greatest (digest, url)
    — and digest/url must come from the SAME capture row (no mix of
    one row's digest with another row's url)."""
    from geokitten_spark.sources.cdx import latest_captures

    caps = spark.createDataFrame(
        [
            # tie on ts: digest 'bb' > 'aa' wins, carrying ITS url u2
            ("k1", 100, "https://k1/u1", "aa"),
            ("k1", 100, "https://k1/u2", "bb"),
            # stale row never competes
            ("k1", 50, "https://k1/old", "zz"),
            # tie on (ts, digest): url breaks it
            ("k2", 7, "https://k2/p", "cc"),
            ("k2", 7, "https://k2/q", "cc"),
        ],
        "urlkey string, ts long, url string, digest string",
    )
    got = {r.urlkey: (r.ts, r.digest, r.url)
           for r in latest_captures(caps).collect()}
    assert got == {
        "k1": (100, "bb", "https://k1/u2"),
        "k2": (7, "cc", "https://k2/q"),
    }
    # twin semantics: DuckDB ROW_NUMBER ordered (ts, digest, url) DESC
    con = duckdb.connect()
    con.sql("""CREATE TABLE caps(urlkey VARCHAR, ts BIGINT,
               url VARCHAR, digest VARCHAR)""")
    con.sql("""INSERT INTO caps VALUES
        ('k1',100,'https://k1/u1','aa'), ('k1',100,'https://k1/u2','bb'),
        ('k1',50,'https://k1/old','zz'),
        ('k2',7,'https://k2/p','cc'), ('k2',7,'https://k2/q','cc')""")
    twin = {r[0]: (r[1], r[2], r[3]) for r in con.sql("""
        SELECT urlkey, ts, digest, url FROM caps
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY urlkey ORDER BY ts DESC, digest DESC, url DESC
        ) = 1""").fetchall()}
    assert twin == got


def test_crawl_delta_plan_is_codegen_joins(spark):
    """No Python in the plan: election aggs + one full-outer join."""
    from geokitten_spark.fixtures import crawl_snapshots
    from geokitten_spark.sources.cdx import crawl_delta
    from tests.conftest import SF_SMOKE

    a, b = crawl_snapshots(spark, SF_SMOKE)
    plan = crawl_delta(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "FullOuter" in plan
