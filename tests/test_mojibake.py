"""Mojibake repair tests (functions/mojibake.py)."""

from pyspark.sql import functions as F

from geokitten_spark.functions.mojibake import (
    corrupt_utf8_cp1252,
    plant_accents,
    repair_mojibake,
    repair_rounds_col,
    repair_text_col,
)


def test_repair_inverts_one_and_two_layers():
    """corrupt^k then repair returns the original text and reports k,
    for k = 1 and 2 (the multi-crawl double-damage case)."""
    s = plant_accents("the quick brown fox jumps over seven lazy dogs")
    one = corrupt_utf8_cp1252(s)
    assert one != s and repair_mojibake(one) == (s, 1)
    two = corrupt_utf8_cp1252(one)
    assert repair_mojibake(two) == (s, 2)


def test_repair_is_conservative():
    """Pure ASCII is untouched (0 rounds); genuinely multilingual text
    the damage model can't produce is untouched; text with chars that
    have no cp1252 byte at all (CJK) is untouched."""
    assert repair_mojibake("plain ascii text.") == ("plain ascii text.", 0)
    # é alone: cp1252-encodes to 0xE9, which is NOT valid UTF-8 alone
    assert repair_mojibake("café au lait") == ("café au lait", 0)
    assert repair_mojibake("日本語のテキスト") == ("日本語のテキスト", 0)
    assert repair_mojibake("emoji \U0001f600 stays") == ("emoji \U0001f600 stays", 0)


def test_repair_fixpoint_terminates():
    """max_rounds bounds the loop even on text that keeps changing."""
    s = corrupt_utf8_cp1252(corrupt_utf8_cp1252(corrupt_utf8_cp1252(plant_accents("aeo"))))
    fixed, rounds = repair_mojibake(s, max_rounds=2)
    assert rounds == 2 and repair_mojibake(fixed) == (plant_accents("aeo"), 1)


def test_repair_cols_match_kernel(spark):
    """The Arrow-batched Columns equal the driver kernel per row, and
    the stage plan is map-only (ArrowEvalPython, no exchange)."""
    rows = [
        ("plain",),
        (corrupt_utf8_cp1252("héllo wörld"),),
        (corrupt_utf8_cp1252(corrupt_utf8_cp1252("dáta")),),
        ("café",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = df.select(
        "text",
        repair_text_col(F.col("text")).alias("fixed"),
        repair_rounds_col(F.col("text")).alias("rounds"),
    )
    for r in out.collect():
        if r["text"] is None:
            assert r["fixed"] is None and r["rounds"] is None
            continue
        want_text, want_rounds = repair_mojibake(r["text"])
        assert (r["fixed"], r["rounds"]) == (want_text, want_rounds)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "ArrowEvalPython" in plan
