"""Unicode NFC normalization (functions/text.py:normalize_nfc)."""

import unicodedata

from pyspark.sql import functions as F

from geokitten_spark.functions.text import normalize_nfc


def test_nfc_folds_decomposed_and_is_idempotent(spark):
    rows = [
        ("café",),          # e + combining acute -> é
        ("niño",),          # n + combining tilde -> ñ
        ("café",),           # already precomposed: unchanged
        ("plain ascii",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "s string")
    got = [r.n for r in df.select(normalize_nfc("s").alias("n")).collect()]
    want = [
        None if s is None else unicodedata.normalize("NFC", s)
        for (s,) in rows
    ]
    assert got == want
    assert got[0] == got[2] == "café"  # both crawls fingerprint alike
    assert got[4] is None
    # idempotence: NFC(NFC(x)) == NFC(x)
    twice = [
        r.n
        for r in df.select(
            normalize_nfc(normalize_nfc("s")).alias("n")
        ).collect()
    ]
    assert twice == got


def test_lang_consistency_planted_docs_all_fire(spark):
    """Every doc_id%7==0 doc (Spanish-saturated final quarter) reports
    is_mixed; the election is deterministic across partitionings."""
    import __spark_entry__ as entrymod

    df = entrymod.q_lang_consistency(spark, "/root/testdata/sf0.001")
    rows = {r["doc_id"]: r for r in df.collect()}
    planted = [d for d in rows if d % 7 == 0]
    assert planted and all(rows[d]["is_mixed"] for d in planted)
    assert all(1 <= rows[d]["n_sections"] <= 4 for d in rows)
    assert all(rows[d]["n_langs"] >= 2 for d in planted)
