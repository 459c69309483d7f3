"""Unigram-LM tokenizer tests (operators/unigram.py)."""

from geokitten_spark.operators.unigram import (
    unigram_tokenize,
    unigram_train,
    unigram_train_spark,
    unigram_vocab_stats,
    unigram_vocab_stats_oracle_rows,
    viterbi_segment,
)
from tests.conftest import SF_SMOKE


def test_viterbi_prefers_high_prob_pieces():
    """With one dominant multi-char piece the ML segmentation uses it;
    with none, the word falls apart into chars."""
    import math

    logp = {"ab": math.log(0.5), "a": math.log(0.2), "b": math.log(0.2),
            "c": math.log(0.1)}
    assert viterbi_segment("abc", logp, 6) == ("ab", "c")
    assert viterbi_segment("cba", logp, 6) == ("c", "b", "a")


def test_viterbi_unknown_chars_fall_back():
    """Chars outside the vocab segment as single unk pieces instead of
    failing — coverage is total by construction."""
    import math

    logp = {"x": math.log(0.9)}
    assert viterbi_segment("xqx", logp, 6) == ("x", "q", "x")
    assert viterbi_segment("", logp, 6) == ()


def test_train_learns_frequent_subwords():
    """Frequent dictionary words survive as whole vocab pieces, every
    learned multi-char piece is a real corpus substring, and every
    word's segmentation reconstructs it exactly."""
    wc = [("walking", 50), ("walked", 40), ("walks", 30), ("talked", 5)]
    logp = unigram_train(wc, vocab_size=20, seed_size=200)
    assert "walked" in logp and viterbi_segment("walked", logp, 6) == ("walked",)
    assert all(
        any(p in w for w, _ in wc) for p in logp if len(p) > 1
    )
    for w, _ in wc:
        assert "".join(viterbi_segment(w, logp, 6)) == w


def test_spark_matches_oracle_replica(spark):
    """The full distributed chain (count agg -> driver train -> Arrow
    Viterbi -> token count) equals the DuckDB-dictionary replica
    integer-for-integer — the parity the driver's hash gate relies on."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = [
        (r["token"], r["n_occ"])
        for r in unigram_vocab_stats(docs, n_top=30).collect()
    ]
    want = unigram_vocab_stats_oracle_rows(SF_SMOKE, n_top=30)
    assert got == want


def test_tokenize_is_map_only(spark):
    """Tokenization adds NO exchange: one ArrowEvalPython over the scan."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    logp = unigram_train_spark(docs, vocab_size=50)
    toks = unigram_tokenize(docs, logp)
    plan = toks._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "ArrowEvalPython" in plan
