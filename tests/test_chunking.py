"""Sliding-window chunking tests (operators/chunking.py)."""

import pytest
from pyspark.sql import functions as F

from geokitten_spark.operators.chunking import chunk_documents
from tests.conftest import SF_SMOKE


def test_chunk_coverage_and_overlap(spark):
    """Every token index is covered, consecutive chunks overlap by
    window - stride, only the LAST chunk may be short, and the chunk
    texts re-join to the original token stream."""
    words = " ".join(f"w{i}" for i in range(70))
    df = spark.createDataFrame([(1, words), (2, "only three words")], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, window=32, stride=24).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    # n=70: 1 + ceil((70-32)/24) = 1 + 2 = 3 chunks
    assert [r["chunk_id"] for r in d1] == [0, 1, 2]
    assert [r["chunk_tokens"] for r in d1] == [32, 32, 70 - 48]
    toks = words.split()
    for r in d1:
        start = r["chunk_id"] * 24
        assert r["chunk_text"] == " ".join(toks[start : start + 32])
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "only three words"
    assert d2[0]["n_tokens"] == 3 and d2[0]["chunk_tokens"] == 3


def test_chunk_boundary_counts(spark):
    """n == window -> one chunk; n == window+1 -> two; a multiple of
    stride past the window adds exactly one chunk per stride."""
    def n_chunks(n):
        df = spark.createDataFrame([(1, " ".join(["x"] * n))], "doc_id long, text string")
        return chunk_documents(df, window=32, stride=24).count()

    assert n_chunks(32) == 1
    assert n_chunks(33) == 2
    assert n_chunks(56) == 2   # 32 + 24
    assert n_chunks(57) == 3


def test_chunk_plan_is_one_map_stage(spark):
    """No Exchange, no Python: chunking must ride the scan."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ch = chunk_documents(docs)
    plan = ch._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    assert ch.count() > docs.count()  # chunking expands rows


def test_chunk_rejects_bad_stride():
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(None, window=16, stride=17)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(None, window=16, stride=0)
