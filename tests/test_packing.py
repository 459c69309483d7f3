"""Sequence-packing operator tests (operators/packing.py)."""

import numpy as np
from pyspark.sql import functions as F

from geokitten_spark.operators.packing import pack_sequences


def _toy(spark, n=200, seed=3):
    rng = np.random.RandomState(seed)
    rows = [(int(i), int(rng.randint(0, 900))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_sequences_matches_naive_global_window(spark):
    """Two-phase packing must equal the naive global-order cumsum."""
    df = _toy(spark)
    out = pack_sequences(
        df, key_col="doc_id", tokens_col="n_tokens", seq_len=512, n_buckets=7
    ).collect()
    got = {r.doc_id: (r.stream_offset, r.first_seq, r.last_seq, r.n_seqs) for r in out}

    # naive: same (hash, key) order, plain running sum
    from geokitten_spark.operators.packing import _order_hash

    rows = (
        df.filter("n_tokens > 0")
        .withColumn("__h", _order_hash(F.col("doc_id"), "pack"))
        .orderBy("__h", "doc_id")
        .collect()
    )
    run = 0
    for r in rows:
        first = run // 512
        last = (run + r.n_tokens - 1) // 512
        assert got[r.doc_id] == (run, first, last, last - first + 1), r.doc_id
        run += r.n_tokens
    assert len(got) == len(rows)  # zero-token docs dropped
    # the stream is gap-free: offsets + lengths tile [0, total)
    total = sum(r.n_tokens for r in rows)
    covered = sorted((v[0], v[0]) for v in got.values())
    assert covered[0][0] == 0 and run == total
    # some docs must span a chunk boundary for the test to mean anything
    assert any(v[3] > 1 for v in got.values())


def test_pack_sequences_deterministic_across_parallelism(spark):
    df = _toy(spark, n=300, seed=9)
    a = pack_sequences(
        df.repartition(32), key_col="doc_id", tokens_col="n_tokens", seq_len=256
    ).collect()
    b = pack_sequences(
        df.coalesce(1), key_col="doc_id", tokens_col="n_tokens", seq_len=256
    ).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}


def test_pack_sequences_plan_has_no_global_window(spark):
    """The window must partition by the coarse bucket — a single-reducer
    global sort/window anywhere in the plan is the scale failure this
    operator exists to avoid."""
    df = _toy(spark)
    out = pack_sequences(df, key_col="doc_id", tokens_col="n_tokens", seq_len=512)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # no single-partition exchange feeding the window
    assert "SinglePartition" not in plan
    # bucket-partitioned: the window's required distribution is __b
    assert "__b" in plan


def test_pack_sequences_rejects_bad_seq_len(spark):
    import pytest

    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(_toy(spark), key_col="doc_id", tokens_col="n_tokens", seq_len=0)
