"""Deterministic cardinality sketches for 100-TB pipeline accounting.

``COUNT(DISTINCT key)`` over 10^12 rows is a full shuffle of every
distinct key; the standard fix is HyperLogLog. Spark's built-in
``approx_count_distinct`` is HLL++ with an engine-private hash, so its
estimates can't be oracle-checked. This module implements classic
HyperLogLog (Flajolet et al. 2007) over the repo's engine-portable
``hash60`` (md5-prefix) hash with EXACT integer register arithmetic, so
Spark and DuckDB produce bit-identical estimates:

* register index = ``hash60 % m`` (m = 2^p registers), sub-hash
  ``w = hash60 // m`` (60-p bits), rank rho = leading-zeros(w)+1
  computed via binary-string length — no floating point;
* per (group, register) max-rank — a corpus-sized shuffle whose output
  is <= m x groups rows, with map-side partial max;
* the harmonic mean's denominator is kept as an exact int64 numerator
  N = sum 2^(bits+1-rho) (dyadic terms scaled integer; max m*2^bits <
  2^63), so the only floating-point steps are one IEEE division and the
  (rounded) small-range ln correction — deterministic across engines.

Standard error ~1.04/sqrt(m): 6.5% at the default m=256; raise m for
tighter accounting (m rows per group cross the final shuffle either way).

The register table is the sketch's merge surface: ``hll_registers``
exposes it, and ``hll_union_distinct`` max-merges register tables built
over disjoint (or overlapping — union is idempotent) slices. Because a
register is a max over a set of per-key ranks, slicing + merging is
LOSSLESS: the union of per-slice sketches is bit-identical to the
single-pass sketch of the whole corpus. That is the property that makes
the sketch usable at 100 TB — each ingest increment sketches its own
slice (m rows out), and history-wide distinct accounting is a max-merge
of tiny register tables, never a re-scan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hash60, hash60_sql

__all__ = [
    "hll_distinct",
    "hll_distinct_sql",
    "hll_registers",
    "hll_union_distinct",
    "cms_counters",
    "cms_merge",
    "cms_lookup",
    "cms_counters_sql",
    "cms_lookup_sql",
    "qhist",
    "qhist_counters",
    "qhist_merge",
    "qhist_quantiles",
    "qhist_sql",
]

_HASH_BITS = 60


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _check_m(m: int) -> int:
    p = m.bit_length() - 1
    if m < 16 or (1 << p) != m:
        raise ValueError("m must be a power of two >= 16")
    return p


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    m: int = 256,
    salt: str = "hll",
) -> DataFrame:
    """Per-group HLL register table: group columns + ``__reg`` (int in
    [0, m)) + ``__R`` (max rank seen, int in [1, 61-log2(m)]).

    This is the sketch's persistence/merge format — at most ``m`` rows
    per group regardless of corpus size, max-mergeable across slices
    (see ``hll_union_distinct``). Null keys are ignored.
    """
    p = _check_m(m)
    bits = _HASH_BITS - p
    h = hash60(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    t = (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("__h", h)
        .withColumn("__reg", F.pmod(F.col("__h"), F.lit(m)))
        .withColumn("__w", F.expr(f"__h div {m}"))
        .withColumn(
            "__rho",
            F.when(F.col("__w") == 0, F.lit(bits + 1)).otherwise(
                F.lit(bits + 1) - F.length(F.bin(F.col("__w")))
            ).cast("int"),
        )
    )
    return t.groupBy(*group_cols, "__reg").agg(F.max("__rho").alias("__R"))


def _hll_estimate(regs: DataFrame, group_cols: list[str], m: int) -> DataFrame:
    """Shared estimate step over a register table — the only floating
    point in the sketch lives here (one IEEE division + rounded ln)."""
    p = _check_m(m)
    bits = _HASH_BITS - p
    alpha = _alpha(m)
    scale = bits + 1  # numerator term = 2^(scale - R), R in [1, scale]
    agg = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - __R)")
        ).alias("__N_present"),
        F.count(F.lit(1)).alias("__present"),
    )
    zeros = F.lit(m) - F.col("__present")
    n_num = (
        F.col("__N_present")
        + zeros * F.lit(1 << scale).cast("long")
    ).cast("double")
    e_raw = F.lit(alpha * m * m * float(1 << scale)) / n_num
    small = (zeros > 0) & (e_raw <= F.lit(2.5 * m))
    est = F.when(
        small, F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 2).alias("hll_distinct"))


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    m: int = 256,
    salt: str = "hll",
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate of ``key_col``.

    Output: group columns + ``hll_distinct`` (double, rounded to 2
    decimals — the raw estimate is deterministic; rounding absorbs any
    last-ulp ``ln`` divergence of the small-range correction between
    engines). Null keys are ignored (SQL COUNT DISTINCT semantics).
    """
    return _hll_estimate(
        hll_registers(df, key_col, group_cols, m=m, salt=salt), group_cols, m
    )


def hll_union_distinct(
    parts: list[DataFrame],
    group_cols: list[str],
    *,
    m: int = 256,
) -> DataFrame:
    """Distinct estimate from the max-merge of per-slice register tables
    (each built by ``hll_registers`` with the SAME m and salt).

    Lossless by construction: max of per-slice maxes == corpus max, so
    the result is bit-identical to ``hll_distinct`` over the
    concatenated slices — the oracle for a union query is simply the
    single-pass sketch. Each input contributes <= m rows per group, so
    merging a year of daily increments shuffles days x m x groups rows,
    never the corpus.
    """
    if not parts:
        raise ValueError("hll_union_distinct needs at least one register table")
    merged = parts[0]
    for nxt in parts[1:]:
        merged = merged.unionByName(nxt)
    regs = merged.groupBy(*group_cols, "__reg").agg(F.max("__R").alias("__R"))
    return _hll_estimate(regs, group_cols, m)


def hll_distinct_sql(
    group_exprs: str,
    key_expr: str,
    from_clause: str,
    *,
    m: int = 256,
    salt: str = "hll",
) -> str:
    """The DuckDB twin: same hash, same integer register math, same
    rounding — estimates match Spark's bit-for-bit."""
    p = _check_m(m)
    bits = _HASH_BITS - p
    alpha = _alpha(m)
    scale = bits + 1
    h = hash60_sql(f"'{salt}:' || CAST({key_expr} AS VARCHAR)")
    # NB: plain decimal-point literals parse as DECIMAL in DuckDB (whose
    # fixed-point multiply overflows here); explicit DOUBLE casts instead
    num = f"(CAST({alpha!r} AS DOUBLE) * {m} * {m} * CAST({1 << scale} AS DOUBLE))"
    return f"""
        SELECT {group_exprs},
               ROUND(CASE WHEN ({m} - __present) > 0
                          AND ({num} / __N) <= {2.5 * m}
                     THEN CAST({m} AS DOUBLE) * LN(CAST({m} AS DOUBLE)
                          / CAST({m} - __present AS DOUBLE))
                     ELSE {num} / __N
                     END, 2) AS hll_distinct
        FROM (
            SELECT {group_exprs},
                   CAST(SUM(1::BIGINT << ({scale} - __R))
                        + ({m} - COUNT(*)) * (1::BIGINT << {scale})
                        AS DOUBLE) AS __N,
                   COUNT(*) AS __present
            FROM (
                SELECT {group_exprs}, __reg, MAX(__rho) AS __R
                FROM (
                    SELECT {group_exprs},
                           (__h % {m}) AS __reg,
                           CASE WHEN (__h // {m}) = 0 THEN {bits + 1}
                                ELSE {bits + 1} - length(bin(__h // {m}))
                           END AS __rho
                    FROM (
                        SELECT *, {h} AS __h FROM {from_clause}
                        WHERE {key_expr} IS NOT NULL
                    )
                )
                GROUP BY {group_exprs}, __reg
            )
            GROUP BY {group_exprs}
        )
    """


# ---------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------
#
# The frequency-side twin of the HLL above: where HLL answers "how many
# distinct keys", count-min answers "how often does THIS key occur"
# without a per-key groupBy of the corpus. The sketch is a d x w integer
# counter grid; every occurrence increments one counter per hash row, a
# point query reads the MIN of its d counters (one-sided error: never an
# underestimate, overestimate <= 2N/w with prob 1 - 2^-d).
#
# Scale shape at 100 TB:
#   * build: ONE pass; posexplode to d rows/occurrence is map-side
#     combined down to <= d*w rows per task before the only shuffle, so
#     the exchange carries O(tasks * d * w), never O(corpus);
#   * the counter table (<= d*w rows of 3 ints) is the persistence AND
#     merge surface — counters are sums, so per-increment sketches
#     SUM-merge losslessly (cms_merge), same contract as the HLL
#     register max-merge;
#   * lookup: broadcast the tiny counter grid against any candidate key
#     set — no corpus re-scan.
#
# All arithmetic is int64 on the engine-portable hash60, so Spark and
# DuckDB agree bit-for-bit (no floating point anywhere in the sketch).


def _cms_buckets(key: Column, d: int, w: int, salt: str) -> Column:
    """Array of the d bucket indices of ``key`` (int in [0, w))."""
    return F.array(
        *[
            F.pmod(
                hash60(F.concat(F.lit(f"{salt}{j}:"), key.cast("string"))),
                F.lit(w),
            ).cast("int")
            for j in range(d)
        ]
    )


def _cms_buckets_sql(key_expr: str, d: int, w: int, salt: str, j_expr: str) -> str:
    """DuckDB twin of one bucket index, parameterized over the hash-row
    index expression ``j_expr`` (joined against generate_series)."""
    salted = f"'{salt}' || CAST({j_expr} AS VARCHAR) || ':' || CAST({key_expr} AS VARCHAR)"
    return f"CAST({hash60_sql(salted)} % {w} AS INT)"


def cms_counters(
    df: DataFrame,
    key_col: str,
    *,
    d: int = 4,
    w: int = 1024,
    weight_col: str | None = None,
    salt: str = "cms",
) -> DataFrame:
    """Build the d x w count-min counter grid over ``key_col``.

    Output: ``__d`` (hash row, int in [0, d)), ``__bucket`` (int in
    [0, w)), ``cnt`` (int64 sum of weights; 1 per occurrence when
    ``weight_col`` is None). At most d*w rows regardless of corpus
    size. Null keys are ignored.
    """
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 hash rows and w >= 2 buckets")
    weight = F.col(weight_col) if weight_col else F.lit(1)
    t = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.posexplode(_cms_buckets(F.col(key_col), d, w, salt)).alias(
                "__d", "__bucket"
            ),
            weight.cast("long").alias("__w"),
        )
    )
    return t.groupBy("__d", "__bucket").agg(F.sum("__w").alias("cnt"))


def cms_merge(parts: list[DataFrame]) -> DataFrame:
    """Sum-merge counter grids built with the SAME (d, w, salt).

    Counters are sums, so merging per-slice sketches is LOSSLESS: the
    merged grid is identical to the single-pass grid over the
    concatenated slices — each increment ships <= d*w rows, never its
    corpus slice.
    """
    if not parts:
        raise ValueError("cms_merge needs at least one counter grid")
    merged = parts[0]
    for nxt in parts[1:]:
        merged = merged.unionByName(nxt)
    return merged.groupBy("__d", "__bucket").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
    out_col: str = "cms_count",
) -> DataFrame:
    """Point-query every row of ``keys`` against a counter grid.

    Returns ``keys``'s columns + ``out_col`` = min over the d hash rows
    (0 for keys the sketch never saw). The grid is <= d*w rows, so the
    join broadcasts — candidate sets of any size probe without a
    corpus-sized shuffle. (d, w, salt) must match the build.
    """
    carry = keys.columns
    probed = keys.select(
        *carry,
        F.posexplode(_cms_buckets(F.col(key_col), d, w, salt)).alias(
            "__d", "__bucket"
        ),
    )
    joined = probed.join(F.broadcast(counters), ["__d", "__bucket"], "left")
    return joined.groupBy(*carry).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col)
    )


def cms_counters_sql(
    key_expr: str,
    from_clause: str,
    *,
    d: int = 4,
    w: int = 1024,
    weight_expr: str = "1",
    salt: str = "cms",
) -> str:
    """DuckDB twin of ``cms_counters`` (columns __d, __bucket, cnt)."""
    bucket = _cms_buckets_sql(key_expr, d, w, salt, "g.j")
    return f"""
        SELECT CAST(g.j AS INT) AS __d, {bucket} AS __bucket,
               CAST(SUM({weight_expr}) AS BIGINT) AS cnt
        FROM {from_clause} CROSS JOIN generate_series(0, {d - 1}) AS g(j)
        WHERE {key_expr} IS NOT NULL
        GROUP BY 1, 2
    """


def cms_lookup_sql(
    counters_cte: str,
    keys_cte: str,
    key_expr: str,
    carry_exprs: str,
    *,
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
    out_col: str = "cms_count",
) -> str:
    """DuckDB twin of ``cms_lookup``: probe ``keys_cte`` (aliased k)
    against ``counters_cte`` (aliased c). ``carry_exprs`` are k-qualified
    output columns."""
    bucket = _cms_buckets_sql(f"k.{key_expr}", d, w, salt, "g.j")
    return f"""
        SELECT {carry_exprs}, MIN(COALESCE(c.cnt, 0)) AS {out_col}
        FROM {keys_cte} k
        CROSS JOIN generate_series(0, {d - 1}) AS g(j)
        LEFT JOIN {counters_cte} c
               ON c.__d = CAST(g.j AS INT) AND c.__bucket = {bucket}
        GROUP BY {carry_exprs}
    """

# ---------------------------------------------------------------------------
# quantile histogram sketch (HDR-histogram bucketing, Tene's hdrhistogram)
# ---------------------------------------------------------------------------
#
# The quantile side of the family: HLL answers "how many distinct", CMS
# "how often this key", this answers "what is the p50/p90/p99" without a
# per-group full sort. Spark's approx_percentile is a KLL/GK-style
# sketch whose compactions depend on stream order — unreproducible
# across engines or even partitionings — so it can't be oracle-checked.
# An HDR histogram is a pure FUNCTION of the value multiset:
#
#   bucket(v) for non-negative int64 v with `sig` significant bits:
#     exp  = max(0, bit_length(v) - sig)
#     mant = v >> exp
#     idx  = exp * 2^sig + mant
#
# Values < 2^sig are exact; above that the bucket lower bound
# (mant << exp) is within relative error 2^-(sig-1) of the true value
# (default sig=8: 0.4%). All arithmetic is int64 — Spark and DuckDB
# agree bit-for-bit, and a quantile read is deterministic: smallest
# bucket whose cumulative count reaches rank ceil(p*n/100), reported as
# that bucket's exact integer lower bound.
#
# Scale shape at 100 TB:
#   * build: ONE pass, map-side combined to <= buckets-per-group rows
#     per task before the only shuffle (buckets <= (64-sig) * 2^sig,
#     ~14k at sig=8, vs a full per-group sort's corpus shuffle);
#   * the counter table is the persistence AND merge surface — counts
#     sum, so per-increment sketches merge losslessly (qhist_merge),
#     the same contract as HLL register max-merge and CMS counter sum;
#   * the quantile read runs over the tiny counter table only (window
#     partitioned BY GROUP — never a SinglePartition).


def _qhist_index(v: str, sig: int):
    """Bucket index column for non-negative int64 column name ``v``
    (raises at runtime on negative input via assert_true)."""
    idx = (
        f"CASE WHEN {v} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(greatest(0, length(bin({v})) - {sig}) AS BIGINT) * {1 << sig} "
        f"     + shiftright({v}, greatest(0, length(bin({v})) - {sig})) END"
    )
    guard = F.coalesce(
        F.assert_true(
            F.col(v) >= 0, F.lit("qhist: negative values unsupported")
        ).cast("long"),
        F.lit(0),
    )
    return F.expr(idx) + guard


def _qhist_index_sql(v: str, sig: int) -> str:
    return (
        f"CASE WHEN {v} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(greatest(0, length(bin({v})) - {sig}) AS BIGINT) * {1 << sig} "
        f"     + ({v} >> greatest(0, length(bin({v})) - {sig})) END"
    )


def _check_percents(percents) -> list[int]:
    ps = list(percents)
    if not ps or any((not isinstance(p, int)) or p < 1 or p > 100 for p in ps):
        raise ValueError("percents must be non-empty integers in [1, 100]")
    return ps


def qhist_counters(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    sig: int = 8,
) -> DataFrame:
    """Per-group HDR bucket counts of non-negative int64 ``value_col``.

    Output: group columns + ``__qb`` (bucket index) + ``cnt`` (int64).
    At most (65-sig) * 2^sig rows per group regardless of corpus size.
    Null values are ignored; negative values raise.
    """
    if not 2 <= sig <= 20:
        raise ValueError("sig must be in [2, 20]")
    t = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        _qhist_index(value_col, sig).alias("__qb"),
    )
    return t.groupBy(*group_cols, "__qb").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def qhist_merge(parts: list[DataFrame]) -> DataFrame:
    """Sum-merge bucket tables built with the SAME sig. Counts are sums,
    so the merged table is bit-identical to the single-pass sketch of
    the concatenated slices (lossless, like cms_merge)."""
    if not parts:
        raise ValueError("qhist_merge needs at least one bucket table")
    merged = parts[0]
    for nxt in parts[1:]:
        merged = merged.unionByName(nxt)
    keys = [c for c in merged.columns if c != "cnt"]
    return merged.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def qhist_quantiles(
    counters: DataFrame,
    group_cols: list[str],
    *,
    percents=(50, 90, 99),
    sig: int = 8,
) -> DataFrame:
    """Quantile read over a bucket table: for each group and integer
    percent p, the exact lower bound of the smallest bucket whose
    cumulative count reaches rank ceil(p*n/100).

    Output: group columns + ``percent`` (int) + ``quantile_est``
    (int64) + ``n_rows`` (int64). Window runs over the tiny bucket
    table, partitioned by group — no SinglePartition anywhere.
    """
    from pyspark.sql import Window

    ps = _check_percents(percents)
    w = Window.partitionBy(*group_cols).orderBy("__qb")
    cum = counters.select(
        *group_cols,
        "__qb",
        F.sum("cnt").over(w).alias("__cum"),
        F.sum("cnt").over(Window.partitionBy(*group_cols)).alias("__n"),
    )
    hit = (
        cum.select(
            *group_cols,
            "__qb",
            "__cum",
            "__n",
            F.explode(F.array(*[F.lit(p) for p in ps])).alias("percent"),
        )
        .filter(
            F.col("__cum") * 100 >= F.col("percent").cast("long") * F.col("__n")
        )
        .groupBy(*group_cols, "percent")
        .agg(F.min("__qb").alias("__qb"), F.max("__n").alias("n_rows"))
    )
    lb = F.expr(f"shiftleft(__qb % {1 << sig}, CAST(__qb div {1 << sig} AS INT))")
    return hit.select(
        *group_cols, "percent", lb.cast("long").alias("quantile_est"), "n_rows"
    )


def qhist(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    percents=(50, 90, 99),
    sig: int = 8,
) -> DataFrame:
    """One-pass per-group quantile estimates (build + read)."""
    return qhist_quantiles(
        qhist_counters(df, value_col, group_cols, sig=sig),
        group_cols,
        percents=percents,
        sig=sig,
    )


def qhist_sql(
    group_exprs: str,
    value_expr: str,
    from_clause: str,
    *,
    percents=(50, 90, 99),
    sig: int = 8,
) -> str:
    """DuckDB twin of ``qhist`` — same integer bucket math, same rank
    rule, bit-identical output."""
    ps = _check_percents(percents)
    idx = _qhist_index_sql("__v", sig)
    plist = ", ".join(str(p) for p in ps)
    return f"""
        SELECT {group_exprs}, CAST(p.percent AS INT) AS percent,
               CAST((MIN(__qb) % {1 << sig}) << CAST(MIN(__qb) // {1 << sig} AS INT)
                    AS BIGINT) AS quantile_est,
               CAST(MAX(__n) AS BIGINT) AS n_rows
        FROM (
            SELECT {group_exprs}, __qb,
                   SUM(cnt) OVER (PARTITION BY {group_exprs}
                                  ORDER BY __qb) AS __cum,
                   SUM(cnt) OVER (PARTITION BY {group_exprs}) AS __n
            FROM (
                SELECT {group_exprs}, {idx} AS __qb, COUNT(*) AS cnt
                FROM (
                    SELECT {group_exprs}, CAST({value_expr} AS BIGINT) AS __v
                    FROM {from_clause}
                    WHERE {value_expr} IS NOT NULL
                )
                GROUP BY {group_exprs}, __qb
            )
        ) CROSS JOIN (SELECT unnest([{plist}]) AS percent) p
        WHERE __cum * 100 >= p.percent * __n
        GROUP BY {group_exprs}, p.percent
    """


# ---------------------------------------------------------------------------
# KMV / theta sketch — set-OVERLAP estimation (the op HLL union can't do)
# ---------------------------------------------------------------------------
# A KMV sketch keeps the k smallest distinct hash60 values of a set; its
# k-th order statistic theta estimates density (k-1 keys landed below
# theta, so |S| ~ (k-1) * 2^60 / theta). Two sketches INTERSECT by
# cutting both at theta = min(theta_a, theta_b) and counting shared
# survivors — the estimate HLL fundamentally cannot produce (inclusion-
# exclusion over HLL unions explodes in error when the overlap is small).
# Pipeline use: estimated url/shingle overlap between two crawls or two
# corpus snapshots WITHOUT joining them — contamination triage, recrawl
# sizing — at the cost of shipping k 8-byte values per side.
#
# Everything is exact int64/decimal integer math on hash60, so DuckDB
# reproduces the estimates bit-for-bit: the only division is an
# integral `div` (Spark) / `//` (DuckDB) of the decimal product
# m * 2^60 by theta — both truncate toward zero on positives.
#
# Scale shape: the sketch build is distinct(hash) -> TakeOrdered(k)
# (per-partition top-k, then one k-row merge on the driver side of the
# job — never a full sort); everything after operates on <= k-row
# frames. A 10^12-key side costs one 8-byte-key distinct shuffle.

_KMV_FULL = 1 << 60  # exclusive hash60 upper bound = "exact mode" theta


def kmv_sketch(df: DataFrame, key_col: str, k: int = 256,
               salt: str = "kmv") -> DataFrame:
    """k smallest DISTINCT hash60 values of ``key_col`` → (h) rows."""
    from .dedup import hash60

    h = hash60(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    return (
        df.select(h.alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def _kmv_theta(sketch: DataFrame, k: int) -> DataFrame:
    """theta = k-th smallest hash when the sketch is full, else 2^60
    (exact mode: every key of the set is in the sketch)."""
    return sketch.agg(
        F.when(F.count("h") >= k, F.max("h"))
        .otherwise(F.lit(_KMV_FULL))
        .cast("long")
        .alias("theta")
    )


def _kmv_est(count_col: str) -> F.Column:
    # floor(count * 2^60 / theta); decimal keeps the 2^68 product exact,
    # `div` truncates toward zero exactly like DuckDB HUGEINT `//`
    return F.expr(
        f"CAST(CAST({count_col} AS DECIMAL(38,0)) * 1152921504606846976 "
        "div theta AS BIGINT)"
    )


def kmv_overlap(a: DataFrame, b: DataFrame, key_col: str, k: int = 256,
                salt: str = "kmv") -> DataFrame:
    """One-row overlap report between two keyed sets: KMV estimates of
    |A|, |B|, |A ∪ B|, |A ∩ B| plus an integer Jaccard percent, with
    the sketch parameters (theta, survivor counts) exposed so the
    estimate is auditable. With BOTH sets smaller than k the sketch
    degrades gracefully to exact counting (theta = 2^60)."""
    sa, sb = kmv_sketch(a, key_col, k, salt), kmv_sketch(b, key_col, k, salt)
    theta = (
        _kmv_theta(sa, k).crossJoin(
            _kmv_theta(sb, k).withColumnRenamed("theta", "theta_b")
        )
        .select(F.least("theta", "theta_b").alias("theta"))
    )
    ra = sa.crossJoin(theta).where(F.col("h") < F.col("theta")).select("h")
    rb = sb.crossJoin(theta).where(F.col("h") < F.col("theta")).select("h")
    counts = (
        ra.select(F.lit(1).alias("in_a"), "h")
        .join(rb.select(F.lit(1).alias("in_b"), "h"), "h", "full_outer")
        .agg(
            F.count("in_a").alias("n_a"),
            F.count("in_b").alias("n_b"),
            F.sum(
                (F.col("in_a").isNotNull() & F.col("in_b").isNotNull())
                .cast("long")
            ).alias("n_both"),
            F.count("h").alias("n_union"),
        )
    )
    est = counts.crossJoin(theta)
    jac = F.expr(
        "CAST(CASE WHEN n_union = 0 THEN 0 "
        "ELSE (100 * n_both) div n_union END AS BIGINT)"
    )
    return est.select(
        _kmv_est("n_a").alias("est_a"),
        _kmv_est("n_b").alias("est_b"),
        _kmv_est("n_union").alias("est_union"),
        _kmv_est("n_both").alias("est_intersect"),
        jac.alias("jaccard_pct"),
        F.col("theta").cast("long").alias("theta"),
        F.col("n_both").cast("long").alias("survivors_both"),
        F.col("n_union").cast("long").alias("survivors_union"),
    )


def kmv_overlap_sql(a_keys: str, b_keys: str, k: int = 256,
                    salt: str = "kmv", extra_ctes: str = "") -> str:
    """DuckDB twin of ``kmv_overlap``: ``a_keys``/``b_keys`` are SELECT
    bodies yielding one VARCHAR column ``key``. ``extra_ctes`` (ending
    in a comma) prepends caller CTEs the key sources reference —
    nesting WITH inside a subquery is not portable. Bit-identical
    output."""
    from .dedup import hash60_sql

    def sk(src: str) -> str:
        h = hash60_sql(f"'{salt}:' || CAST(key AS VARCHAR)")
        return (f"SELECT DISTINCT {h} AS h FROM ({src}) "
                f"WHERE key IS NOT NULL ORDER BY h LIMIT {k}")

    full = _KMV_FULL
    return f"""
        WITH {extra_ctes}
        sa AS ({sk(a_keys)}),
        sb AS ({sk(b_keys)}),
        th AS (
            SELECT LEAST(
                (SELECT CASE WHEN COUNT(h) >= {k} THEN MAX(h)
                             ELSE {full} END FROM sa),
                (SELECT CASE WHEN COUNT(h) >= {k} THEN MAX(h)
                             ELSE {full} END FROM sb)
            ) AS theta
        ),
        ra AS (SELECT h FROM sa, th WHERE h < theta),
        rb AS (SELECT h FROM sb, th WHERE h < theta),
        c AS (
            SELECT COUNT(ra.h) AS n_a, COUNT(rb.h) AS n_b,
                   COUNT(CASE WHEN ra.h IS NOT NULL AND rb.h IS NOT NULL
                              THEN 1 END) AS n_both,
                   COUNT(COALESCE(ra.h, rb.h)) AS n_union
            FROM ra FULL OUTER JOIN rb ON ra.h = rb.h
        )
        SELECT
            CAST((CAST(n_a AS HUGEINT) * {full}) // theta AS BIGINT) AS est_a,
            CAST((CAST(n_b AS HUGEINT) * {full}) // theta AS BIGINT) AS est_b,
            CAST((CAST(n_union AS HUGEINT) * {full}) // theta AS BIGINT)
                AS est_union,
            CAST((CAST(n_both AS HUGEINT) * {full}) // theta AS BIGINT)
                AS est_intersect,
            CAST(CASE WHEN n_union = 0 THEN 0
                      ELSE (100 * n_both) // n_union END AS BIGINT)
                AS jaccard_pct,
            CAST(theta AS BIGINT) AS theta,
            CAST(n_both AS BIGINT) AS survivors_both,
            CAST(n_union AS BIGINT) AS survivors_union
        FROM c, th
    """
