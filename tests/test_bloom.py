"""Bloom incremental-dedup tests (strict oracle parity is covered by the
driver-contract `dedup_bloom` query; these pin the operator semantics)."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from geokitten_spark.operators.bloom import (
    BITS_PER_WORD,
    bloom_build,
    bloom_dedup,
    bloom_probe,
)

from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _np_positions(fp: str, *, n_words: int, k: int) -> list[int]:
    m = n_words * BITS_PER_WORD
    return [
        int(hashlib.md5(f"{fp}#b{i}".encode()).hexdigest()[:15], 16) % m
        for i in range(k)
    ]


def test_build_matches_numpy_replica(spark):
    """The distributed bit_or aggregation must produce the exact filter
    an independent hashlib/numpy pass builds."""
    fps = [f"fp-{i:04d}" for i in range(300)]
    df = spark.createDataFrame([(f,) for f in fps], "fp string")
    n_words, k = 256, 5
    got = bloom_build(df, "fp", n_words=n_words, k=k)
    want = np.zeros(n_words, dtype=np.int64)
    for f in fps:
        for p in _np_positions(f, n_words=n_words, k=k):
            want[p // BITS_PER_WORD] |= np.int64(1) << np.int64(p % BITS_PER_WORD)
    assert np.array_equal(got, want)
    # 60-bit words: the sign bit (and bits 60-63) must never be set
    assert (got >= 0).all()


def test_no_false_negatives_and_exact_hits(spark):
    """Every incoming doc whose fingerprint exists in history MUST be
    flagged (Bloom guarantees no false negatives); the sf fixture has
    planted cross-slice duplicates so the check is non-vacuous."""
    out = bloom_dedup(_docs(spark)).collect()
    seen = [r for r in out if r.seen]
    assert len(seen) >= 5, "fixture must have cross-slice duplicates"
    assert all(r.maybe_seen for r in seen)


def test_literal_and_arrow_modes_agree(spark):
    docs = _docs(spark)
    lit = {r.doc_id: r.maybe_seen for r in bloom_dedup(docs, mode="literal").collect()}
    arw = {r.doc_id: r.maybe_seen for r in bloom_dedup(docs, mode="arrow").collect()}
    assert lit == arw


def test_literal_probe_is_map_only(spark):
    """The probe must not shuffle the incoming slice: zero Exchanges in
    the literal-mode plan."""
    inc = _docs(spark).select(F.md5("text").alias("fp"))
    filt = np.zeros(64, dtype=np.int64)
    plan = (
        bloom_probe(inc, filt, "fp", mode="literal")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_false_positive_rate_within_theory(spark):
    """Probe fingerprints that are NOT in the filter: the measured FP
    rate must be within 3x the theoretical (1-e^{-kn/m})^k bound (it is
    deterministic for this fixed corpus, so this cannot flake)."""
    n_words, k, n_hist = 64, 3, 600  # deliberately undersized filter
    hist = spark.createDataFrame(
        [(f"h-{i}",) for i in range(n_hist)], "fp string"
    )
    filt = bloom_build(hist, "fp", n_words=n_words, k=k)
    probe = spark.createDataFrame(
        [(f"q-{i}",) for i in range(2000)], "fp string"
    )
    got = bloom_probe(probe, filt, "fp", k=k).collect()
    fpr = sum(r.maybe_seen for r in got) / len(got)
    m = n_words * BITS_PER_WORD
    theory = (1.0 - np.exp(-k * n_hist / m)) ** k
    assert fpr <= 3 * theory
    assert fpr > 0  # an undersized filter must show SOME false positives


def test_table_mode_agrees_with_literal(spark):
    docs = _docs(spark)
    lit = {r.doc_id: r.maybe_seen for r in bloom_dedup(docs, mode="literal").collect()}
    tab = {r.doc_id: r.maybe_seen for r in bloom_dedup(docs, mode="table").collect()}
    assert lit == tab


def test_table_mode_never_materializes_filter_on_driver(spark):
    """Round-4 scale fix: in table mode the filter is a lazy DataFrame —
    constructing the dedup pipeline runs ZERO Spark jobs (nothing is
    collected or broadcast-built), and the executed plan folds + probes
    the filter via a (shard, word) join inside one lineage."""
    docs = _docs(spark)
    docs.schema  # force the parquet footer read outside the job group
    sc = spark.sparkContext
    sc.setJobGroup("bloom_table_build", "laziness check")
    try:
        out = bloom_dedup(docs, mode="table")
        assert sc.statusTracker().getJobIdsForGroup("bloom_table_build") == []
    finally:
        sc.setJobGroup(None, None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "bit_or" in plan  # filter build lives INSIDE the plan
    assert "Join" in plan


def test_sharded_table_roundtrips_through_partitioned_parquet(spark, tmp_path):
    """The production shape: persist the sharded filter partitioned by
    shard, probe a later slice against the re-read table — verdicts must
    equal the in-memory filter's."""
    from geokitten_spark.operators.bloom import bloom_build_table, bloom_probe_table

    fps = spark.createDataFrame(
        [(f"fp-{i:04d}",) for i in range(500)], "fp string"
    )
    store = str(tmp_path / "filt")
    bloom_build_table(fps, "fp", n_words=256, k=5, n_shards=8).write.partitionBy(
        "shard"
    ).parquet(store)
    filt_df = spark.read.parquet(store)
    inc = spark.createDataFrame(
        [(f"fp-{i:04d}",) for i in range(400, 600)], "fp string"
    )
    got = {
        r.fp: r.maybe_seen
        for r in bloom_probe_table(
            inc, filt_df, "fp", n_words=256, k=5, n_shards=8
        ).collect()
    }
    filt = bloom_build(fps, "fp", n_words=256, k=5)
    want = {
        r.fp: r.maybe_seen
        for r in bloom_probe(inc, filt, "fp", k=5, mode="literal").collect()
    }
    assert got == want
    assert all(got[f"fp-{i:04d}"] for i in range(400, 500))  # no false negatives


def test_null_fingerprints_yield_null_in_every_mode(spark):
    """ADVICE round-3: literal mode null-propagates while arrow mode
    crashed on None positions — all three modes must now agree that a
    NULL fingerprint gets a NULL verdict."""
    inc = spark.createDataFrame([("fp-1",), (None,), ("fp-2",)], "fp string")
    filt = bloom_build(
        spark.createDataFrame([("fp-1",)], "fp string"), "fp", n_words=64, k=3
    )
    lit = {r.fp: r.maybe_seen for r in bloom_probe(inc, filt, "fp", k=3, mode="literal").collect()}
    arw = {r.fp: r.maybe_seen for r in bloom_probe(inc, filt, "fp", k=3, mode="arrow").collect()}
    from geokitten_spark.operators.bloom import bloom_build_table, bloom_probe_table

    filt_df = bloom_build_table(
        spark.createDataFrame([("fp-1",)], "fp string"), "fp", n_words=64, k=3, n_shards=4
    )
    tab = {
        r.fp: r.maybe_seen
        for r in bloom_probe_table(inc, filt_df, "fp", n_words=64, k=3, n_shards=4).collect()
    }
    assert lit == arw == tab
    assert lit[None] is None and lit["fp-1"] is True
