"""Temporal operators: as-of join, session windows (SURVEY §2.4 J5, §2.6).

``asof_join`` is the single-shuffle formulation: instead of a theta-join
(quadratic) or a per-key loop, both sides are unioned with a side marker
and ONE window pass per key carries the most recent right-side row forward
(``last(..., ignoreNulls)`` over rows up to current). At 10^12 rows this
is exactly one shuffle on the join key — the same plan Flink/kdb-style
as-of joins lower to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "sessionize"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the most recent right row (right.ts <=
    left.ts) with the same ``on`` key; null when no such row.

    Ties on ts: the right row sorts first (<= semantics); among right rows
    with identical ts the last by input order of ``right_cols[0]`` wins —
    pass a deduplicated right side for fully deterministic output.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts_col)]
    l_marked = left.withColumn("__side", F.lit(1))
    r_marked = right.select(
        on, ts_col, *[F.col(c).alias(f"{prefix}{c}") for c in right_cols]
    ).withColumn("__side", F.lit(0))
    unioned = l_marked.unionByName(r_marked, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in right_cols:
        carried = carried.withColumn(
            f"{prefix}{c}", F.last(f"{prefix}{c}", ignorenulls=True).over(w)
        )
    return carried.filter(F.col("__side") == 1).drop("__side")


def sessionize(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gaps-and-islands sessionization (the batch twin of Structured
    Streaming's ``session_window``): rows of (key, session_start,
    session_end=max(ts)+gap, n_events)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    # cast via timestamp: TIMESTAMP_NTZ has no direct long cast in Spark 4
    secs = F.col(ts_col).cast("timestamp").cast("long")
    prev_secs = F.lag(F.col(ts_col)).over(w).cast("timestamp").cast("long")
    marked = events.withColumn(
        "__new",
        F.when(secs - prev_secs > gap_minutes * 60, 1)
        .otherwise(F.when(prev_secs.isNull(), 1).otherwise(0)),
    ).withColumn("__session", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        marked.groupBy(key_col, "__session")
        .agg(
            F.min(ts_col).alias("session_start"),
            (F.max(ts_col) + gap).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__session")
    )
