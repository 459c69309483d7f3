"""Learned-BPE tokenizer (operators/bpe.py): kernel semantics, the
Sennrich training rule, and Spark-vs-pure-Python parity."""

import pytest

from geokitten_spark.operators.bpe import (
    _apply_merge,
    bpe_merges,
    bpe_tokenize,
    bpe_train,
    bpe_vocab_stats,
    bpe_vocab_stats_oracle_rows,
    bpe_word,
)

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# pure kernel
# ---------------------------------------------------------------------------

def test_apply_merge_all_occurrences_left_to_right():
    assert _apply_merge(tuple("aaa"), "a", "a") == ("aa", "a")
    assert _apply_merge(tuple("abab"), "a", "b") == ("ab", "ab")
    assert _apply_merge(tuple("xyz"), "a", "b") == ("x", "y", "z")


def test_bpe_merges_classic_example():
    # Sennrich et al. fig.1 flavor: 'est' dominates across newest/widest.
    wc = [("newest", 6), ("widest", 3), ("low", 5), ("lower", 2)]
    merges = bpe_merges(wc, n_merges=3)
    # first merge: most frequent adjacent pair. e+s occurs 9x, s+t 9x,
    # others <=9; tie (9) breaks lexicographically -> ('e','s').
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")  # 'es'+'t' now 9x, the max


def test_bpe_merges_stops_on_hapax_pairs():
    # every pair occurs once -> no merge is worth learning
    assert bpe_merges([("ab", 1), ("cd", 1)], n_merges=10) == []


def test_bpe_word_greedy_lowest_rank():
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("l", "o"): 2}
    assert bpe_word("newest", ranks) == ("n", "e", "w", "est")
    assert bpe_word("low", ranks) == ("lo", "w")
    assert bpe_word("x", ranks) == ("x",)
    assert bpe_word("", ranks) == ()


def test_trainer_and_tokenizer_agree_on_training_words():
    """A word from the dictionary must tokenize to exactly the symbols
    the trainer's final vocab holds for it (same _apply_merge rule)."""
    wc = [("banana", 10), ("bandana", 4), ("cabana", 3)]
    merges = bpe_merges(wc, n_merges=8)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w, _ in wc:
        syms = tuple(w)
        for a, b in merges:
            syms = _apply_merge(syms, a, b)
        assert bpe_word(w, ranks) == syms


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_bpe_train_matches_pure_python(spark, docs):
    """Distributed dictionary -> same merges as a pandas-built dictionary."""
    import duckdb

    merges = bpe_train(docs, vocab_words=2000, n_merges=40)
    wc = duckdb.sql(
        f"""
        SELECT w, count(*) AS c FROM (
            SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
            FROM read_parquet('{SF_SMOKE}/documents.parquet')
        ) WHERE w != '' GROUP BY 1 ORDER BY c DESC, w LIMIT 2000
        """
    ).fetchall()
    assert merges == bpe_merges([(w, c) for w, c in wc], n_merges=40)
    assert len(merges) > 0


def test_bpe_tokenize_concat_reconstructs_words(spark, docs):
    """Subwords of each doc concatenate back to its whitespace words."""
    merges = bpe_train(docs.limit(50), vocab_words=500, n_merges=20)
    out = bpe_tokenize(docs.limit(20), merges).select("text", "bpe_tokens").collect()
    for r in out:
        words = [w for w in r.text.lower().strip().split() if w]
        assert "".join(r.bpe_tokens) == "".join(words)


def test_bpe_vocab_stats_matches_oracle(spark, docs):
    got = sorted(
        (r.token, r.n_occ)
        for r in bpe_vocab_stats(
            docs, vocab_words=10_000, n_merges=200, n_top=50
        ).collect()
    )
    want = sorted(bpe_vocab_stats_oracle_rows(SF_SMOKE))
    assert got == want


def test_bpe_tokenize_partitioning_independent(spark, docs):
    merges = bpe_train(docs, vocab_words=1000, n_merges=30)
    a = bpe_tokenize(docs, merges).select("doc_id", "bpe_tokens")
    b = bpe_tokenize(docs.repartition(13), merges).select("doc_id", "bpe_tokens")
    assert sorted(map(tuple, ((r.doc_id, tuple(r.bpe_tokens)) for r in a.collect()))) == sorted(
        map(tuple, ((r.doc_id, tuple(r.bpe_tokens)) for r in b.collect()))
    )
