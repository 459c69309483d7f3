"""Dense-cell skew mitigation (SURVEY §4, north_rule "salted-key skew
mitigation for dense cells").

Two mechanisms, composable with AQE's skew-join backstop:

* ``cell_histogram`` — the pre-pass that finds hot cells (a cheap
  partial-aggregated count; at 10^12 rows run it on a sample).
* ``salted_join`` — equi-join where the LEFT (big, skewed) side's key is
  salted ``key*S + pmod(hash(tag), S)`` and the RIGHT side is exploded
  ×S, so one hot key fans out over S reducers. The salt is a PURE
  function of (key, tag) — never random — so stage retries and
  snapshot resume are deterministic (SURVEY §4 "deterministic UDF
  kernels").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cell_histogram", "choose_salt_factor", "salted_join"]


def cell_histogram(df: DataFrame, cell_col: str = "cell_id") -> DataFrame:
    """Per-cell row counts, descending — the skew pre-pass."""
    return df.groupBy(cell_col).count().orderBy(F.col("count").desc())


def choose_salt_factor(
    hist_df: DataFrame, *, target_rows_per_task: int = 1_000_000, max_salt: int = 64
) -> int:
    """Salt factor from the histogram: hottest cell / target rows per task,
    clamped to [1, max_salt]."""
    top = hist_df.limit(1).collect()
    if not top:
        return 1
    hottest = top[0]["count"]
    s = int((hottest + target_rows_per_task - 1) // target_rows_per_task)
    return max(1, min(max_salt, s))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt: int,
    big_tag_col: str,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join on ``on``: salt the big side deterministically by
    ``big_tag_col``, explode the small side ×salt.

    ``salt=1`` degenerates to a plain join (same plan shape)."""
    if salt <= 1:
        return big.join(small, on=on, how=how)
    salted_key = (
        F.col(on) * salt + F.pmod(F.xxhash64(F.col(big_tag_col)), F.lit(salt))
    ).alias("__salted")
    big_s = big.withColumn("__salted", salted_key)
    small_s = small.withColumn(
        "__s", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salted", F.col(on) * salt + F.col("__s")).drop("__s", on)
    return big_s.join(small_s, on="__salted", how=how).drop("__salted")
