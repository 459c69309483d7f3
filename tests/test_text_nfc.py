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
