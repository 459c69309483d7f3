"""Bucketed tables for co-located (shuffle-free) joins — SURVEY §4.

At 10^12 rows the docs table is re-joined on ``cell_id`` by many
downstream stages (tiling join, kNN candidates, region rollups). Writing
it bucketed+sorted on the key once means every later equi-join on that
key needs NO exchange and NO sort: Catalyst sees the bucketing and plans a
zip-partitions sort-merge join. The snapshot layer's stage outputs are the
natural place to apply this (one shuffle at write time amortized over all
downstream reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table", "range_partition"]


def range_partition(df: DataFrame, col: str, n_partitions: int) -> DataFrame:
    """Explicit RANGE partitioning on a (cell-id) key — the north rule's
    complement to hash bucketing. Spark samples the key distribution and
    assigns contiguous key ranges to partitions, so (a) spatially adjacent
    cells co-locate (good for neighborhood ops and run-length-friendly
    encodings) and (b) a downstream sort within partitions is cheap.
    Plans as RangePartitioning (asserted in tests)."""
    return df.repartitionByRange(n_partitions, col)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) table on
    ``bucket_col``. Joins between tables bucketed the same way are
    exchange-free."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
