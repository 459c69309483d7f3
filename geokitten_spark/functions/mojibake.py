"""Mojibake repair — undo UTF-8 bytes mis-decoded as Windows-1252.

The single most common encoding damage in real web crawls: a page is
UTF-8, some upstream stage decoded it as cp1252 (or latin-1) and
re-emitted UTF-8, turning every non-ASCII char into 2-4 "Ã©"-style
chars; pipelines that aggregate multiple crawls see it applied twice.
The repair is the exact inverse — re-encode as cp1252 and re-decode as
UTF-8 — applied to a fixpoint, and is conservative by construction:

* pure-ASCII text round-trips byte-identically (no change, 0 rounds);
* text whose cp1252 re-encoding is NOT valid UTF-8 (i.e. genuinely
  composed non-ASCII text, not mojibake) is left untouched;
* chars with no cp1252 byte at all (CJK, emoji, ...) stop the loop
  immediately — real multilingual content can never be "repaired".

Scale shape: the repair is one Arrow-batched ``pandas_udf`` map pass —
no shuffle, no state; it composes with every other map-only cleaning
stage into a single WholeStageCodegen+Python scan. The kernel is a
pure function of the string, so the VALUES oracle re-runs it
driver-side over the same fixture rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType

__all__ = [
    "repair_mojibake",
    "corrupt_utf8_cp1252",
    "plant_accents",
    "repair_text_col",
    "repair_rounds_col",
]

# Python's cp1252 codec raises on the five undefined bytes
# (0x81 0x8D 0x8F 0x90 0x9D) in BOTH directions, which is exactly the
# strictness the fixpoint loop needs: any failure means "not mojibake".


def repair_mojibake(s: str, max_rounds: int = 4) -> tuple[str, int]:
    """Undo up to ``max_rounds`` layers of UTF-8-as-cp1252 damage.
    Returns (repaired_text, rounds_applied). Each round re-encodes the
    current text as cp1252 and re-decodes as UTF-8; the loop stops the
    moment either codec rejects or the text stops changing."""
    rounds = 0
    for _ in range(max_rounds):
        try:
            b = s.encode("cp1252")
        except UnicodeEncodeError:
            break
        try:
            u = b.decode("utf-8")
        except UnicodeDecodeError:
            break
        if u == s:
            break
        s = u
        rounds += 1
    return s, rounds


def corrupt_utf8_cp1252(s: str) -> str:
    """Apply ONE layer of the damage (fixture side): emit the text's
    UTF-8 bytes re-decoded as cp1252 — the exact inverse of one repair
    round."""
    return s.encode("utf-8").decode("cp1252")


def plant_accents(s: str) -> str:
    """Deterministically introduce non-ASCII content (the corpus is
    pure ASCII): a -> á, e -> é, o -> ö. All three encode to cp1252-
    decodable UTF-8 byte pairs, so 1-2 corruption layers stay in the
    repairable regime."""
    return s.replace("a", "á").replace("e", "é").replace("o", "ö")


def repair_text_col(text: Column) -> Column:
    """Repaired text as a Column (Arrow-batched, map-only)."""

    @pandas_udf(StringType())
    def _fix(col: pd.Series) -> pd.Series:
        return col.map(lambda s: repair_mojibake(s)[0] if s is not None else None)

    return _fix(text)


def repair_rounds_col(text: Column) -> Column:
    """How many damage layers were undone, as a Column (0 = clean)."""

    @pandas_udf(IntegerType())
    def _rounds(col: pd.Series) -> pd.Series:
        return col.map(
            lambda s: repair_mojibake(s)[1] if s is not None else None
        ).astype("Int32")

    return _rounds(text)
