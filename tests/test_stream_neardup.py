"""Streaming incremental near-dup tests (streaming/neardup.py)."""

import os

from pyspark.sql import functions as F

from geokitten_spark.fixtures import _NEARDUP_ID_OFFSET, neardup_corpus
from geokitten_spark.operators.dedup import simhash_neardup
from geokitten_spark.streaming import run_to_memory
from geokitten_spark.streaming.neardup import (
    neardup_flags_stream,
    simhash_banded_stream,
)
from tests.conftest import SF_SMOKE


def test_stream_equals_batch_pair_set(spark, tmp_path):
    """Batch==stream duality: under id-monotone arrival the incremental
    verdicts must equal the batch banded-pair set aggregated per doc —
    every near-dup copy flags with dup_of = its smallest earlier match,
    and nothing else flags."""
    corpus = neardup_corpus(spark, SF_SMOKE)
    src = str(tmp_path / "snd")
    corpus.filter(F.col("doc_id") < _NEARDUP_ID_OFFSET).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    corpus.filter(F.col("doc_id") >= _NEARDUP_ID_OFFSET).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    flags = neardup_flags_stream(simhash_banded_stream(stream))
    run_to_memory(flags, "t_snd", os.path.join(src, "_ckpt"), output_mode="append")
    got = {
        r["doc_id"]: r["dup_of"]
        for r in spark.table("t_snd")
        .groupBy("doc_id")
        .agg(F.min("dup_of").alias("dup_of"))
        .collect()
    }
    want: dict = {}
    for r in simhash_neardup(corpus).collect():
        cur = want.get(r["doc_b"])
        want[r["doc_b"]] = r["doc_a"] if cur is None or r["doc_a"] < cur else cur
    assert got == want
    assert len(want) > 0  # the fixture plants real near-dups
    # every planted copy flags (its smallest match may be an even
    # earlier similar doc, but never later than its own original)
    planted = {d for d in want if d >= _NEARDUP_ID_OFFSET}
    assert len(planted) > 0
    assert all(want[d] <= d - _NEARDUP_ID_OFFSET for d in planted)


def test_state_only_carries_fingerprints(spark):
    """The stateful stage's input stream carries (doc_id, sim, band,
    bkey) ONLY — no text crosses into state (the 100-TB guarantee)."""
    corpus = neardup_corpus(spark, SF_SMOKE)
    banded = simhash_banded_stream(corpus)  # batch DF: same exprs
    assert set(banded.columns) == {"doc_id", "sim", "band", "bkey"}
    kinds = dict(banded.dtypes)
    assert kinds["sim"] == "bigint" and kinds["bkey"] == "bigint"
