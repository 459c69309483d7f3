"""Deterministic-sampling operator tests (oracle parity is covered by
test_oracle_queries via the driver-contract queries)."""

from pyspark.sql import functions as F

from geokitten_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    sample_per_group,
)


def _docs(spark, n=2000, parts=4):
    return spark.range(n, numPartitions=parts).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )


def test_hash_sample_deterministic_across_partitionings(spark):
    a = {r.doc_id for r in hash_sample(_docs(spark, parts=2), "doc_id", 0.1).collect()}
    b = {r.doc_id for r in hash_sample(_docs(spark, parts=16), "doc_id", 0.1).collect()}
    assert a == b and 120 < len(a) < 280  # ~10% of 2000, binomial bounds

    # fraction monotonicity: a smaller sample is a SUBSET of a larger one
    # (nested samples — the property that makes fraction tuning re-use data)
    c = {r.doc_id for r in hash_sample(_docs(spark), "doc_id", 0.3).collect()}
    assert a <= c

    # different salt -> a different (independent) sample
    d = {r.doc_id for r in hash_sample(_docs(spark), "doc_id", 0.1, salt="t").collect()}
    assert d != a


def test_stratified_sample_respects_fractions(spark):
    out = stratified_sample(
        _docs(spark), "doc_id", "lang", {"en": 0.1, "de": 1.0}
    )
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("de") == 667  # kept whole
    assert "fr" not in counts  # unlisted stratum dropped
    assert 30 < counts.get("en", 0) < 110  # ~10% of 667


def test_sample_per_group_exact_k_and_deterministic(spark):
    out1 = sample_per_group(_docs(spark, parts=2), "doc_id", "lang", 5)
    out2 = sample_per_group(_docs(spark, parts=16), "doc_id", "lang", 5)
    rows1 = sorted((r.lang, r.doc_id) for r in out1.collect())
    rows2 = sorted((r.lang, r.doc_id) for r in out2.collect())
    assert rows1 == rows2
    per = {}
    for lang, _ in rows1:
        per[lang] = per.get(lang, 0) + 1
    assert per == {"en": 5, "de": 5, "fr": 5}

    # groups smaller than k keep all rows
    tiny = sample_per_group(_docs(spark, n=4), "doc_id", "lang", 5)
    assert tiny.count() == 4


def test_split_assign_deterministic_and_complete(spark):
    """split_assign: every row gets exactly one label, proportions land
    near the requested fractions, assignment is identical across
    partitionings and runs (pure function of the key)."""
    from geokitten_spark.operators.sampling import split_assign

    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    out = df.select("k", split_assign(F.col("k"), splits).alias("s"))
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 5000
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02

    a = {r["k"]: r["s"] for r in out.collect()}
    b = {
        r["k"]: r["s"]
        for r in df.repartition(13)
        .select("k", split_assign(F.col("k"), splits).alias("s"))
        .collect()
    }
    assert a == b


def test_sample_token_budget_semantics(spark):
    """Budget packing: per group the selection is the hash-ordered prefix
    whose pre-doc cumulative tokens < budget; partitioning-independent;
    budget fills (first crossing doc included)."""
    from pyspark.sql import functions as F

    from geokitten_spark.operators.dedup import hash60
    from geokitten_spark.operators.sampling import sample_token_budget

    rows = [(i, "a" if i % 2 == 0 else "b", 10 + (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_tokens"])
    out = sample_token_budget(
        df, key_col="doc_id", group_col="lang", tokens_col="n_tokens",
        budget=150, n_buckets=8,
    ).collect()

    # python replica (global hash order per group)
    import hashlib

    def h(i):
        v = int(hashlib.md5(f"tb:{i}".encode()).hexdigest()[:15], 16) % 1_000_000
        return (v % 8, v, i)

    expect = set()
    for g in ("a", "b"):
        docs = sorted((r for r in rows if r[1] == g), key=lambda r: h(r[0]))
        run = 0
        for did, _, tok in docs:
            if run < 150:
                expect.add(did)
            run += tok
    got = {r["doc_id"] for r in out}
    assert got == expect
    # budget fills: selected tokens reach >= budget per group
    for g in ("a", "b"):
        sel = sum(r["n_tokens"] for r in out if r["lang"] == g)
        assert sel >= 150

    # partitioning independence
    out2 = sample_token_budget(
        df.repartition(13), key_col="doc_id", group_col="lang",
        tokens_col="n_tokens", budget=150, n_buckets=8,
    ).collect()
    assert {r["doc_id"] for r in out2} == expect


def test_largest_remainder_quotas_exact():
    """Quotas sum to exactly the budget, respect proportionality within
    1, and are pure-integer deterministic (tie goes to smaller source)."""
    from geokitten_spark.operators.sampling import largest_remainder_quotas

    q = largest_remainder_quotas({"a": 1, "b": 1, "c": 1}, total=100)
    assert sum(q.values()) == 100 and sorted(q.values()) == [33, 33, 34]
    # the leftover seat goes to the largest remainder; all equal -> 'a'
    assert q["a"] == 34
    w = {f"s{i}": i + 1 for i in range(7)}
    q2 = largest_remainder_quotas(w, total=500)
    assert sum(q2.values()) == 500
    tot = sum(w.values())
    for s, k in q2.items():
        assert abs(k - 500 * w[s] / tot) < 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        largest_remainder_quotas({"a": 0}, total=10)


def test_mix_sources_exact_counts_and_determinism(spark):
    """Exactly quota rows per source, sources without a quota dropped,
    same selection at any partitioning, and the window plans as
    WindowGroupLimit (partial top-k before the exchange)."""
    from geokitten_spark.operators.sampling import (
        largest_remainder_quotas,
        mix_sources,
    )

    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    quotas = largest_remainder_quotas({"src0": 3, "src1": 1, "src2": 1}, total=40)
    got = mix_sources(docs, quotas).select("doc_id", "source").collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert {s: len(v) for s, v in by_src.items()} == quotas
    again = mix_sources(docs.repartition(13), quotas).select("doc_id", "source").collect()
    assert {(r["doc_id"], r["source"]) for r in again} == {
        (r["doc_id"], r["source"]) for r in got
    }
    plan = mix_sources(docs, quotas)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_mix_sources_starved_source_validate(spark):
    """A source with fewer rows than its quota under-fills silently by
    default (documented), and validate=True raises naming the starved
    source with its shortfall."""
    import pytest as _pytest

    from geokitten_spark.operators.sampling import mix_sources

    docs = spark.createDataFrame(
        [(i, "big" if i < 8 else "tiny") for i in range(10)],
        "doc_id long, source string",
    )
    quotas = {"big": 5, "tiny": 4}  # tiny has only 2 rows
    got = mix_sources(docs, quotas).groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"big": 5, "tiny": 2}
    with _pytest.raises(ValueError, match="tiny: wanted 4 got 2"):
        mix_sources(docs, quotas, validate=True)
    # no starvation -> validate passes and returns the same selection
    ok = mix_sources(docs, {"big": 5, "tiny": 2}, validate=True)
    assert ok.count() == 7
