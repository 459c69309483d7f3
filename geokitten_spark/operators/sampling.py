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


# ---------------------------------------------------------------------------
# token-budget sampling: take docs per group until a token budget fills,
# in deterministic hash order. The naive form is a per-group window cumsum
# — a single reducer per group at 10^12 rows — so the operator is
# two-phase: (1) aggregate token sums per (group, hash-bucket) — one
# shuffle, tiny output; (2) the driver prefix-sums the bucket table and
# broadcasts per-bucket decisions: buckets fully under budget pass with a
# map-only filter, the ONE boundary bucket per group runs the window
# cumsum on its own (tiny) row set. Deterministic: bucket and order are
# pure functions of the doc key.
# ---------------------------------------------------------------------------

def sample_token_budget(
    df: DataFrame,
    *,
    key_col: str,
    group_col: str,
    tokens_col: str,
    budget: int,
    n_buckets: int = 64,
    salt: str = "tb",
) -> DataFrame:
    """Rows selected per group until ``budget`` tokens, hash-ordered.

    A doc is selected iff the cumulative token count of all docs BEFORE
    it (by (hash, key) order within its group) is < ``budget`` — the
    first doc to cross the line is still included (budget fills, never
    starves). Output: input columns + ``cum_before``.
    """
    from pyspark.sql import Window

    h = _bucket(F.col(key_col), salt)
    b = F.pmod(h, F.lit(n_buckets)).cast("long")
    t = df.withColumn("__h", h).withColumn("__b", b)

    # phase 1: per-(group, bucket) token sums — the only doc-sized shuffle
    per_bucket = (
        t.groupBy(group_col, "__b")
        .agg(F.sum(F.col(tokens_col)).cast("long").alias("__tok"))
        .collect()
    )
    # phase 2 (driver, O(groups x buckets)): prefix sums in bucket order
    by_group: dict = {}
    for r in per_bucket:
        by_group.setdefault(r[group_col], []).append((int(r["__b"]), int(r["__tok"])))
    full_rows = []      # (group, bucket) fully selected
    boundary_rows = []  # (group, bucket, tokens_before_bucket)
    for g, pairs in by_group.items():
        run = 0
        for bk, tok in sorted(pairs):
            if run >= budget:
                break  # budget already filled by earlier buckets
            if run + tok < budget:
                full_rows.append((g, bk))
            else:
                boundary_rows.append((g, bk, run))
            run += tok
    spark = df.sparkSession
    full_df = spark.createDataFrame(
        full_rows or [(None, None)], [group_col, "__b"]
    ).filter(F.col("__b").isNotNull())
    bnd_df = spark.createDataFrame(
        boundary_rows or [(None, None, None)], [group_col, "__b", "__before"]
    ).filter(F.col("__b").isNotNull())

    # full buckets: map-only broadcast semi-join; cum_before within the
    # bucket region is not individually needed — recompute the doc-level
    # prefix only on the boundary bucket
    full = t.join(F.broadcast(full_df), on=[group_col, "__b"], how="left_semi")
    w = (
        Window.partitionBy(group_col, "__b")
        .orderBy(F.col("__h").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bnd = (
        t.join(F.broadcast(bnd_df), on=[group_col, "__b"])
        .withColumn(
            "__cum_in_bucket",
            F.coalesce(F.sum(F.col(tokens_col)).over(w), F.lit(0)).cast("long"),
        )
        .filter(F.col("__before") + F.col("__cum_in_bucket") < budget)
        .drop("__cum_in_bucket", "__before")
    )
    return full.unionByName(bnd).drop("__h", "__b")


def sample_token_budget_sql(
    table_sql: str,
    *,
    key_expr: str,
    group_expr: str,
    tokens_expr: str,
    budget: int,
    n_buckets: int = 64,
    salt: str = "tb",
) -> str:
    """DuckDB twin: the same selection predicate as ONE global window
    (cum tokens before the doc, ordered by (bucket, hash, key) per group,
    < budget) — semantically identical to the two-phase Spark plan."""
    b = f"({_bucket_sql(key_expr, salt)}) % {n_buckets}"
    h = _bucket_sql(key_expr, salt)
    return f"""
        SELECT * EXCLUDE (__cum) FROM (
            SELECT *,
                   COALESCE(SUM({tokens_expr}) OVER (
                       PARTITION BY {group_expr}
                       ORDER BY {b}, {h}, {key_expr}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS __cum
            FROM ({table_sql})
        ) WHERE __cum < {budget}
    """


# ---------------------------------------------------------------------------
# dataset mixing — exact integer quotas per source (Hamilton apportionment)
# ---------------------------------------------------------------------------

def largest_remainder_quotas(weights: dict[str, int], total: int) -> dict[str, int]:
    """Apportion ``total`` rows across sources proportionally to INTEGER
    weights with the largest-remainder (Hamilton) method: exact base
    shares ``total*w // W``, leftover seats to the largest remainders
    (``total*w % W``), ties to the lexicographically smaller source.
    Pure integer math — no float shares, so the quota vector is
    identical in any engine and sums to exactly ``total``."""
    if total < 0:
        raise ValueError("total must be >= 0")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-negative with a positive sum")
    W = sum(weights.values())
    base = {s: total * w // W for s, w in weights.items()}
    left = total - sum(base.values())
    order = sorted(weights, key=lambda s: (-(total * weights[s] % W), s))
    for s in order[:left]:
        base[s] += 1
    return base


def mix_sources(
    df: DataFrame,
    quotas: dict[str, int],
    *,
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
    validate: bool = False,
) -> DataFrame:
    """Take UP TO ``quotas[source]`` rows per source, chosen by hash
    rank — the deterministic face of mixture sampling (DoReMi-style
    domain weights become hard quotas via ``largest_remainder_quotas``).

    A source with at least ``quotas[source]`` rows yields EXACTLY its
    quota; a starved source (fewer rows than its quota) yields all its
    rows, so the mixed total can be under budget. Pass
    ``validate=True`` to detect that: it runs one aggregate over the
    (already quota-bounded) output and raises ``ValueError`` naming
    every starved source and its shortfall.

    One shuffle on the source key; the per-source top-k window plans as
    WindowGroupLimit (partial per-partition limit BEFORE the exchange),
    so the shuffle carries at most ~k rows per (source, input
    partition), not the corpus. Sources absent from ``quotas`` are
    dropped. Resume-safe: pure function of (key, source)."""
    from pyspark.sql import Window

    b = _bucket(F.col(key_col), salt)
    q = F.lit(0)
    for s, k in sorted(quotas.items()):
        q = F.when(F.col(source_col) == s, F.lit(int(k))).otherwise(q)
    w = Window.partitionBy(source_col).orderBy(b.asc(), F.col(key_col).asc())
    # the per-source quota is a CASE expression, which defeats the
    # WindowGroupLimit rewrite (it needs rank <= LITERAL) — so ALSO
    # bound by the literal max quota: the optimizer turns that into a
    # partial per-partition top-k BEFORE the exchange, and the CASE
    # filter trims to the exact per-source quota after
    max_q = int(max(quotas.values(), default=0))
    out = (
        df.withColumn("__rk", F.row_number().over(w))
        .filter((F.col("__rk") <= F.lit(max_q)) & (F.col("__rk") <= q))
        .drop("__rk")
    )
    if validate:
        got = {
            r["s"]: r["n"]
            for r in out.groupBy(F.col(source_col).alias("s"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        starved = {
            s: (k, got.get(s, 0))
            for s, k in sorted(quotas.items())
            if got.get(s, 0) < k
        }
        if starved:
            detail = ", ".join(
                f"{s}: wanted {k} got {g}" for s, (k, g) in starved.items()
            )
            raise ValueError(f"mix_sources starved sources — {detail}")
    return out


def mix_sources_sql(
    quotas: dict[str, int],
    *,
    key_expr: str = "doc_id",
    source_expr: str = "source",
    salt: str = "mix",
) -> str:
    """WHERE-clause twin: ``rk <= CASE source ... END`` over the same
    hash-ranked window (embed in a query that defines ``rk``)."""
    whens = " ".join(
        f"WHEN {source_expr} = '{s}' THEN {int(k)}" for s, k in sorted(quotas.items())
    )
    return f"rk <= (CASE {whens} ELSE 0 END)"


def mix_rank_sql(key_expr: str = "doc_id", source_expr: str = "source", *, salt: str = "mix") -> str:
    """The ROW_NUMBER() expression the twin window needs."""
    return (
        f"ROW_NUMBER() OVER (PARTITION BY {source_expr} "
        f"ORDER BY {_bucket_sql(key_expr, salt)} ASC, {key_expr} ASC)"
    )
