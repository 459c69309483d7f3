"""Sitemap lane tests (sources/sitemap.py)."""

from pyspark.sql import functions as F

from geokitten_spark.sources.sitemap import (
    parse_sitemapindex,
    parse_urlset,
    render_sitemaps,
    sitemap_frontier,
)


def _urls(spark):
    rows = [
        ("a.example", "https://a.example/p1", "2025-01-05"),
        ("a.example", "https://a.example/p2", "2025-01-09"),
        ("b.example", "https://b.example/only", "2025-01-02"),
    ]
    return spark.createDataFrame(rows, "host string, url string, lastmod string")


def test_render_parse_roundtrip(spark):
    """parse(render(x)) == x, entries sorted by url, one XML per host,
    and the document is a well-formed 0.9 urlset."""
    sm = render_sitemaps(_urls(spark))
    xmls = {r["host"]: r["xml"] for r in sm.collect()}
    assert len(xmls) == 2
    assert xmls["a.example"].startswith('<?xml version="1.0"')
    assert 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"' in xmls["a.example"]
    assert xmls["a.example"].index("/p1") < xmls["a.example"].index("/p2")
    got = {
        (r["host"], r["loc"], r["lastmod"]) for r in parse_urlset(sm).collect()
    }
    want = {tuple(r) for r in _urls(spark).collect()}
    assert got == want


def test_parse_sitemapindex_two_level(spark):
    xml = (
        '<?xml version="1.0"?><sitemapindex xmlns="x">'
        "<sitemap><loc>https://a.example/sm1.xml</loc></sitemap>"
        "<sitemap><loc>https://a.example/sm2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame([("a.example", xml)], "host string, xml string")
    got = [r["child_loc"] for r in parse_sitemapindex(df).orderBy("child_loc").collect()]
    assert got == ["https://a.example/sm1.xml", "https://a.example/sm2.xml"]


def test_frontier_counts(spark):
    """n_new = listed-not-crawled, n_stale = crawled-not-listed, and
    latest_lastmod comes only from listed rows."""
    listed = spark.createDataFrame(
        [
            ("a.example", "https://a.example/p1", "2025-01-05"),
            ("a.example", "https://a.example/new", "2025-02-01"),
        ],
        "host string, loc string, lastmod string",
    )
    crawled = spark.createDataFrame(
        [
            ("a.example", "https://a.example/p1"),
            ("a.example", "https://a.example/ghost"),
        ],
        "host string, url string",
    )
    r = sitemap_frontier(listed, crawled).first()
    assert (r["n_listed"], r["n_crawled"], r["n_new"], r["n_stale"]) == (2, 2, 1, 1)
    assert r["latest_lastmod"] == "2025-02-01"


def test_frontier_cross_host_url_not_conflated(spark):
    """The same URL string listed by host A but crawled under host B
    (cross-host sitemap entries are legal) must count as A's frontier
    AND B's ghost — the reconcile join is host-qualified."""
    shared = "https://cdn.example/asset"
    listed = spark.createDataFrame(
        [("a.example", shared, "2025-01-01")],
        "host string, loc string, lastmod string",
    )
    crawled = spark.createDataFrame(
        [("b.example", shared)], "host string, url string"
    )
    rows = {r["host"]: r for r in sitemap_frontier(listed, crawled).collect()}
    a, b = rows["a.example"], rows["b.example"]
    assert (a["n_listed"], a["n_crawled"], a["n_new"], a["n_stale"]) == (1, 0, 1, 0)
    assert (b["n_listed"], b["n_crawled"], b["n_new"], b["n_stale"]) == (0, 1, 0, 1)


def test_parse_plan_is_jvm_only(spark):
    sm = render_sitemaps(_urls(spark))
    plan = parse_urlset(sm)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
