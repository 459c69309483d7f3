"""Deterministic sampling operators for training-data pipelines.

Sampling in a 100-TB pipeline must be a PURE FUNCTION of the row key —
never ``rand()`` — so that stage retries, snapshot resume, and re-runs at
different parallelism produce byte-identical samples (SURVEY §4
"deterministic UDF kernels"), and so an oracle can verify the exact rows.

All three operators are single-pass, shuffle-free where possible, and
SQL-expressible with the shared engine-portable ``hash60`` (md5-prefix)
hash, so the DuckDB oracle checks the exact sampled rows:

* ``hash_sample``        — Bernoulli p-sampling by key hash (a filter:
  no shuffle, fully pushdown-friendly);
* ``stratified_sample``  — per-stratum fractions (filter with per-stratum
  thresholds; no shuffle);
* ``sample_per_group``   — exactly-k-per-group by hash rank (one shuffle
  on the group key; the window is per-group top-k, which Spark plans as
  WindowGroupLimit — partial per-partition limit before the exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60, hash60_sql

__all__ = [
    "hash_sample",
    "hash_sample_sql",
    "stratified_sample",
    "stratified_sample_sql",
    "sample_per_group",
    "sample_per_group_sql",
    "split_assign",
    "split_assign_sql",
]

_BUCKETS = 1_000_000


def _bucket(key: Column, salt: str) -> Column:
    return F.pmod(hash60(F.concat(F.lit(f"{salt}:"), key.cast("string"))), F.lit(_BUCKETS))


def _bucket_sql(key_expr: str, salt: str) -> str:
    h = hash60_sql(f"'{salt}:' || CAST({key_expr} AS VARCHAR)")
    return f"(({h}) % {_BUCKETS})"


def hash_sample(df: DataFrame, key_col: str, fraction: float, *, salt: str = "s") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key hashes into the
    first ``fraction`` of {0..1e6} buckets. Pure filter — no shuffle, and
    Catalyst pushes any surrounding projection/filter through it."""
    return df.filter(_bucket(F.col(key_col), salt) < int(fraction * _BUCKETS))


def hash_sample_sql(key_expr: str, fraction: float, *, salt: str = "s") -> str:
    """The WHERE-clause twin for DuckDB."""
    return f"{_bucket_sql(key_expr, salt)} < {int(fraction * _BUCKETS)}"


def split_assign(
    key: Column, splits: list[tuple[str, float]], *, salt: str = "split"
) -> Column:
    """Deterministic train/val/test split label from a stable key.

    A pure per-row expression (map-only at 10^12 rows; no shuffle, no RNG
    state): the key hashes into a bucket, consecutive bucket ranges map to
    the named splits in order. Fractions must sum to 1. Resume-safe and
    replication-stable: the same row lands in the same split on every
    run, any cluster size, any partitioning.
    """
    assert abs(sum(f for _, f in splits) - 1.0) < 1e-9
    b = _bucket(key, salt)
    out = None
    hi = 0
    for name, frac in splits[:-1]:
        hi += int(frac * _BUCKETS)
        clause = b < hi
        out = F.when(clause, F.lit(name)) if out is None else out.when(clause, F.lit(name))
    last = splits[-1][0]
    return F.lit(last) if out is None else out.otherwise(F.lit(last))


def split_assign_sql(
    key_expr: str, splits: list[tuple[str, float]], *, salt: str = "split"
) -> str:
    b = _bucket_sql(key_expr, salt)
    whens = []
    hi = 0
    for name, frac in splits[:-1]:
        hi += int(frac * _BUCKETS)
        whens.append(f"WHEN {b} < {hi} THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{splits[-1][0]}' END"


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict, *, salt: str = "s"
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 5%,
    keep 'pt' at 100%). Strata missing from ``fractions`` are dropped
    (fraction 0.0) — the explicit-quota semantics of corpus curation."""
    b = _bucket(F.col(key_col), salt)
    thr = F.lit(0)
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == stratum, int(frac * _BUCKETS)).otherwise(thr)
    return df.filter(b < thr)


def stratified_sample_sql(
    key_expr: str, strata_expr: str, fractions: dict, *, salt: str = "s"
) -> str:
    whens = " ".join(
        f"WHEN {strata_expr} = '{s}' THEN {int(f * _BUCKETS)}"
        for s, f in sorted(fractions.items())
    )
    return f"{_bucket_sql(key_expr, salt)} < (CASE {whens} ELSE 0 END)"


def sample_per_group(
    df: DataFrame, key_col: str, group_col: str, k: int, *, salt: str = "s"
) -> DataFrame:
    """Exactly min(k, group size) rows per group, chosen by hash rank —
    the deterministic equivalent of per-group reservoir sampling. One
    shuffle on the group key; rank ties broken by the key itself."""
    from pyspark.sql import Window

    b = _bucket(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy(b.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def sample_per_group_sql(
    select_cols: str, from_clause: str, key_expr: str, group_expr: str, k: int,
    *, salt: str = "s",
) -> str:
    b = _bucket_sql(key_expr, salt)
    return f"""
        SELECT {select_cols} FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY {group_expr}
                ORDER BY {b} ASC, {key_expr} ASC) AS __rk
            FROM {from_clause}
        ) WHERE __rk <= {k}
    """
