"""Dense-cell skew mitigation (SURVEY §4, north_rule "salted-key skew
mitigation for dense cells").

Two mechanisms, composable with AQE's skew-join backstop:

* ``cell_histogram`` — the pre-pass that finds hot cells (a cheap
  partial-aggregated count; at 10^12 rows run it on a sample).
* ``salted_join`` — equi-join on ``(key, salt)`` where the LEFT (big,
  skewed) side's salt is ``pmod(hash(tag), S)`` and the RIGHT side is
  exploded ×S, so one hot key fans out over S reducers. The salt is a
  PURE function of the tag — never random — so stage retries and
  snapshot resume are deterministic (SURVEY §4 "deterministic UDF
  kernels"). The join key stays a (key, salt) column PAIR — never
  ``key*S + salt`` arithmetic, which overflows BIGINT for packed grid
  cell ids (``res<<58 | ix<<29 | iy`` is already ~2^61) and throws
  under Spark 4's default ANSI mode.
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
    ``big_tag_col``, explode the small side ×salt, join on the
    ``(on, __salt)`` column pair — overflow-proof for any BIGINT key.

    ``salt=1`` degenerates to a plain join (same plan shape)."""
    if salt <= 1:
        return big.join(small, on=on, how=how)
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(big_tag_col)), F.lit(salt)).cast("int")
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(small_s, on=[on, "__salt"], how=how).drop("__salt")
