"""Boilerplate-removal tests (functions/boilerplate.py)."""

from pyspark.sql import functions as F

from geokitten_spark.functions.boilerplate import (
    block_features,
    boilerplate_html,
    extract_main_content,
)

ARTICLE = (
    "the quick brown fox jumps over the lazy dog and keeps "
    "running through the long field for many more words"
)

PAGE = (
    "<html><head><title>T</title><style>p {}</style></head><body>"
    '<div class="nav"><a href="/">Home</a> <a href="/a">About us</a></div>'
    f"<div><p>{ARTICLE}</p></div>"
    '<ul><li><a href="/1">One link</a></li><li><a href="/2">Two link</a></li></ul>'
    '<footer><a href="/tos">Terms</a> short footer line</footer>'
    "</body></html>"
)


def test_extract_keeps_only_the_article(spark):
    df = spark.createDataFrame([(PAGE,)], "html string")
    r = df.select(extract_main_content(F.col("html")).alias("o")).first()["o"]
    assert r["n_kept"] == 1
    assert r["main"] == ARTICLE


def test_block_features_counts(spark):
    """Per-block word / link-word counts: the nav block is 100% link
    words, the article has zero, and head content never appears."""
    df = spark.createDataFrame([(PAGE,)], "html string")
    feats = df.select(block_features(F.col("html")).alias("f")).first()["f"]
    by_txt = {s["txt"]: (s["words"], s["link_words"]) for s in feats if s["txt"]}
    # inline-tag stripping replaces tags with spaces, so nav text keeps
    # the doubled separators — match on the word tuple, not raw bytes
    nav = [k for k in by_txt if k.split() == ["Home", "About", "us"]]
    assert len(nav) == 1 and by_txt[nav[0]] == (3, 3)
    assert by_txt[ARTICLE] == (len(ARTICLE.split()), 0)
    assert all("T" != t and "style" not in t for t in by_txt)


def test_multiple_content_blocks_join_in_order(spark):
    first = "alpha " * 12
    second = "omega " * 15
    page = f"<body><p>{first.strip()}</p><nav><a href='/'>x</a></nav><p>{second.strip()}</p></body>"
    df = spark.createDataFrame([(page,)], "html string")
    r = df.select(extract_main_content(F.col("html")).alias("o")).first()["o"]
    assert r["n_kept"] == 2
    assert r["main"] == first.strip() + "\n" + second.strip()


def test_link_density_threshold_boundary(spark):
    """Exactly at the 1/3 boundary the block is KEPT (<=); just above
    it is dropped."""
    body_words = " ".join(f"w{i}" for i in range(8))  # 8 plain words
    at = f"<p><a href='/x'>l1 l2 l3 l4</a> {body_words}</p>"  # 4/12 > 1/3? 4 <= 12*1/3=4 -> kept
    above = f"<p><a href='/x'>l1 l2 l3 l4 l5</a> {body_words}</p>"  # 5/13 > 1/3 -> dropped
    df = spark.createDataFrame([(at,), (above,)], "html string")
    got = [
        r["o"]["n_kept"]
        for r in df.select(extract_main_content(F.col("html"), min_words=5).alias("o")).collect()
    ]
    assert got == [1, 0]


def test_fixture_page_plan_is_codegen_only(spark):
    """The whole render+extract pipeline over documents must be one
    map-only codegen stage: no Exchange, no Python evaluator."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    page = boilerplate_html(F.col("doc_id"), F.col("text"), F.col("lang"))
    out = docs.select("doc_id", extract_main_content(page).alias("o"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
    rows = out.select("doc_id", "o.n_kept", "o.main").collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert all(r["n_kept"] == 1 and r["main"] == texts[r["doc_id"]].strip() for r in rows)
