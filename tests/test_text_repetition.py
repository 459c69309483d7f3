"""Unit tests for the Gopher-style repetition signals (functions/text.py).

The fold (longest_equal_run) is the pure-Catalyst workhorse: applied to a
sorted gram array it yields max multiplicity, applied raw it yields the
longest consecutive run. Verified here against a plain-Python reference
on crafted edges and random word soups.
"""

import random
from collections import Counter

import pyspark.sql.functions as F

from geokitten_spark.functions.text import (
    REP_MAX_RUN,
    longest_equal_run,
    repetition_cols,
    split_words,
    word_bigrams,
)


def _py_max_run(ws):
    best = run = 0
    prev = None
    for w in ws:
        run = run + 1 if w == prev else 1
        best = max(best, run)
        prev = w
    return best


def _py_signals(text):
    ws = [w for w in text.split(" ") if w]
    bg = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return {
        "n_words": len(ws),
        "n_distinct": len(set(ws)),
        "top_unigram": max(Counter(ws).values()) if ws else 0,
        "top_bigram": max(Counter(bg).values()) if bg else 0,
        "n_bigrams": len(bg),
        "max_run": _py_max_run(ws),
    }


def _spark_signals(spark, texts):
    r = repetition_cols(F.col("text"))
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return df.select(*[v.alias(k) for k, v in r.items()]).collect()


def test_crafted_edges(spark):
    filler = " ".join(f"w{i}" for i in range(17))
    texts = [
        f"x x x {filler}",  # 20 words, run of 3 -> flagged via max_run
        "",                # empty doc
        "solo",            # single word, no bigrams
        "a b a b a b",     # alternating: top bigram 'a b' x3, run 1
        "  padded   doc ", # stray spaces collapse to empty tokens
        "x x x y z",       # run of 3 but < REP_MIN_WORDS -> NOT flagged
    ]
    rows = _spark_signals(spark, texts)
    for text, row in zip(texts, rows):
        exp = _py_signals(text)
        for k, v in exp.items():
            assert row[k] == v, f"{text!r}: {k} {row[k]} != {v}"
    assert rows[0]["rep_flagged"] is True and REP_MAX_RUN <= 3
    assert rows[1]["rep_flagged"] is False  # empty doc never flagged
    assert rows[3]["top_bigram"] == 3 and rows[3]["max_run"] == 1
    # the word-count floor: ratio/run filters only apply at >= REP_MIN_WORDS,
    # so short docs (which trivially have extreme ratios) never flag
    assert rows[2]["rep_flagged"] is False
    assert rows[5]["rep_flagged"] is False


def test_random_word_soup_matches_python(spark):
    rng = random.Random(1234)
    vocab = ["the", "spark", "batch", "row", "x", "y"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40)))
        for _ in range(60)
    ]
    rows = _spark_signals(spark, texts)
    for text, row in zip(texts, rows):
        exp = _py_signals(text)
        for k, v in exp.items():
            assert row[k] == v, f"{text!r}: {k} {row[k]} != {v}"


def test_fold_equals_multiplicity_on_sorted(spark):
    df = spark.createDataFrame(
        [(["b", "a", "b", "c", "b"],), ([],), (["z"],)],
        "arr array<string>",
    )
    got = df.select(
        longest_equal_run(F.array_sort(F.col("arr"))).alias("mult"),
        longest_equal_run(F.col("arr")).alias("run"),
    ).collect()
    assert [(r["mult"], r["run"]) for r in got] == [(3, 1), (0, 0), (1, 1)]


def test_bigrams_of_split(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    got = df.select(word_bigrams(split_words(F.col("text"))).alias("bg")).first()
    assert got["bg"] == ["a b", "b c"]


def test_c4_clean_rules(spark):
    """C4 heuristics, rule by rule: short lines, no-terminal-punct lines
    and javascript lines drop; docs with < 3 kept lines, curly braces or
    lorem ipsum drop whole."""
    from pyspark.sql import functions as F

    from geokitten_spark.functions.text import c4_clean_cols

    rows = [
        (1, "Good first sentence right here today.\n"
            "Another proper sentence with enough words.\n"
            "And a third complete sentence to finish!"),
        (2, "too short.\nno terminal punctuation at all here\n"
            "a javascript sentence with plenty of words here.\n"
            "Only one good sentence lives in this doc."),
        (3, "Document with curly { braces } should drop whole.\n"
            "Even though this sentence would survive cleaning fine.\n"
            "And this third one also would survive just fine."),
        (4, "Lorem Ipsum dolor sit amet consectetur adipiscing elit.\n"
            "A second fully valid sentence with many words.\n"
            "A third fully valid sentence with many words."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    c = c4_clean_cols(F.col("text"))
    got = {
        r["doc_id"]: (r["n"], r["kept"], r["clean"])
        for r in df.select(
            "doc_id",
            c["n_lines_kept"].alias("n"),
            c["doc_kept"].alias("kept"),
            c["cleaned_text"].alias("clean"),
        ).collect()
    }
    assert got[1][0] == 3 and got[1][1] is True
    assert got[2][0] == 1 and got[2][1] is False
    assert "javascript" not in got[2][2] and "too short" not in got[2][2]
    assert got[3][1] is False      # curly brace doc-level drop
    assert got[4][1] is False      # lorem ipsum doc-level drop


def test_compression_signal_separates_prose_from_spam(spark):
    """The Gopher/RefinedWeb deflate heuristic: repeated-boilerplate
    text lands at a far lower comp_permille than natural-ish prose, the
    UDF equals driver zlib exactly, and the pass is map-only."""
    import zlib

    from geokitten_spark.functions.text import compression_signal_cols

    prose = ("the quick brown fox jumps over the lazy dog and then "
             "wanders far away to see what else the day may bring along")
    spam = "buy now " * 40
    df = spark.createDataFrame([(1, prose), (2, spam)], "doc_id long, text string")
    cols = compression_signal_cols(F.col("text"))
    out = {
        r["doc_id"]: (r["raw_len"], r["comp_len"], r["comp_permille"])
        for r in df.select(
            "doc_id",
            cols["raw_len"].alias("raw_len"),
            cols["comp_len"].alias("comp_len"),
            cols["comp_permille"].alias("comp_permille"),
        ).collect()
    }
    for did, s in [(1, prose), (2, spam)]:
        raw = len(s.encode("utf-8"))
        comp = len(zlib.compress(s.encode("utf-8"), 6))
        assert out[did] == (raw, comp, comp * 1000 // raw)
    assert out[2][2] < 200 < out[1][2]  # spam compresses ~10x better
    plan = df.select(cols["comp_permille"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
