"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) picks pretraining documents from a raw pool that
look like a small target domain: featurize every document as a bag of
hashed word n-grams, fit two bag-of-buckets multinomials (target /
raw), and weight each pool document by its log likelihood ratio
``sum_g [ln p_target(b(g)) - ln p_raw(b(g))]``. The top-weighted slice
is the selected corpus. This is the standard cheap domain-transfer
selector (used for Pile->Wikipedia-like selection in the paper).

Spark-first shape:

* **Feature extraction is pure Catalyst**: words are split once into a
  projected column (so the regex split is NOT re-inlined per lambda
  reference — see the measured note in ``dedup.word_shingles``),
  bigrams come from ``zip_with`` over two slices, and bucketing is the
  repo's engine-portable md5 ``hash60`` mod ``n_buckets``. No Python.
* **The two multinomials collapse to <= n_buckets rows in ONE corpus
  pass**: a single explode + groupBy(bucket) with conditional counts
  produces target and raw counts together (map-side combined),
  collected as a control-plane table (4096 longs each by default —
  same budget as the Bloom filter / k-means centroids) and re-inlined
  as TWO array literals of raw counts. At 100 TB the whole operator is
  exactly two corpus scans: this count pass and the scoring pass.
* **Scoring is map-only, zero shuffles**: per document ONE codegen
  ``aggregate`` fold over the gram array adds
  ``ln(ct[b]+1) - ln(cr[b]+1)`` per gram, then the constant
  ``n_grams * (ln(R+B) - ln(T+B))`` normalizer lands in a single
  trailing add — the exact association order the DuckDB twin
  replicates, so the 6-decimal rounded weights match bit-for-bit.
* **Selection is a distributed top-k** (``TakeOrderedAndProject`` via
  orderBy+limit on the rounded weight with doc-id tie-break), never a
  single-reducer global window.

Smoothing is add-one over ``n_buckets`` (the hashed vocabulary is
closed, so Laplace is well-defined). At 100 TB only the two count
aggregations touch the corpus, each emitting <= n_buckets rows per
partition; everything else is map-side.

Reference parity: the reference repo has no selection surface; this
extends the training-data-pipeline lane next to the bigram-LM
perplexity filter (``operators/lm.py``), which scores fluency where
DSIR scores domain match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60, hash60_sql

__all__ = [
    "dsir_select",
    "dsir_select_sql",
    "dsir_resample",
    "dsir_resample_sql",
]

TWO60 = float(1 << 60)


def _grams(words: Column) -> Column:
    """Word unigrams followed by bigrams (NOT distinct — DSIR is a bag
    model, counts matter)."""
    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, n - 1),
        F.slice(words, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(words, bigrams)


def _grams_sql(w: str = "w") -> str:
    """DuckDB twin of :func:`_grams` over a pre-split word list."""
    return (
        f"list_concat({w}, list_transform("
        f"generate_series(1, len({w}) - 1), i -> {w}[i] || ' ' || {w}[i+1]))"
    )


def _pool_scored(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    target_col: str,
    target_value: str,
    n_buckets: int,
) -> DataFrame:
    """(doc_id, __logw) for every raw-pool document — the shared two-scan
    core of :func:`dsir_select` and :func:`dsir_resample`. ``__logw`` is
    the un-rounded log importance ratio; callers round AFTER any further
    arithmetic so association order stays oracle-matchable."""
    B = n_buckets
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(target_col).alias("__t"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("w"),
    ).select(
        "doc_id",
        "__t",
        F.transform(_grams(F.col("w")), lambda g: F.pmod(hash60(g), F.lit(B))).alias(
            "bkts"
        ),
    )

    is_tgt = F.col("__t") == target_value
    rows = (
        base.select(is_tgt.alias("__is_t"), F.explode("bkts").alias("b"))
        .groupBy("b")
        .agg(
            F.count_if("__is_t").alias("c_t"),
            F.count_if(~F.col("__is_t")).alias("c_r"),
        )
        .collect()
    )
    ct, cr = [0] * B, [0] * B
    for r in rows:
        ct[r.b], cr[r.b] = r.c_t, r.c_r
    T, R = sum(ct), sum(cr)
    # per-gram: ln(ct[b]+1) - ln(cr[b]+1), summed left-to-right; constant
    # normalizer folded in ONE trailing add so the DuckDB twin can match
    # association order. The per-bucket log-ratio is precomputed into ONE
    # literal double array (B values), so the interpreted fold does a
    # single element_at per gram instead of two element_at + two ln calls
    # — the same addends in the same order (ln is a pure function of the
    # bucket's counts; parity with the oracle is on the 6-decimal-rounded
    # weight, which absorbs the <=1-ulp libm difference of computing the
    # per-bucket log driver-side).
    import math

    lw = [math.log(ct[b] + 1.0) - math.log(cr[b] + 1.0) for b in range(B)]
    lit_lw = F.lit(lw)
    per_gram = F.aggregate(
        F.col("bkts"),
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(lit_lw, (b + 1).cast("int")),
    )
    norm = F.size("bkts") * (
        F.log(F.lit(float(R + B))) - F.log(F.lit(float(T + B)))
    )
    return base.filter(F.col("__t") != target_value).select(
        "doc_id", (per_gram + norm).alias("__logw")
    )


def dsir_select(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 4096,
    n_top: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Top ``n_top`` docs of the raw pool (``target_col != target_value``)
    by hashed-n-gram importance weight toward the target slice
    (``target_col == target_value``). Returns (doc_id, logw) sorted by
    (logw desc, doc_id)."""
    scored = _pool_scored(
        docs,
        id_col=id_col,
        text_col=text_col,
        target_col=target_col,
        target_value=target_value,
        n_buckets=n_buckets,
    ).select("doc_id", F.round("__logw", round_to).alias("logw"))
    return scored.orderBy(F.desc("logw"), "doc_id").limit(n_top)


def _gumbel(doc_id: Column, seed: str) -> Column:
    """Deterministic standard-Gumbel noise from the engine-portable md5
    hash of ``seed:doc_id`` — ``u = (h + 0.5) / 2**60`` is strictly inside
    (0, 1), then ``g = -ln(-ln u)``. Same formula in the DuckDB twin."""
    u = (
        hash60(F.concat(F.lit(f"{seed}:"), doc_id.cast("string"))).cast("double")
        + 0.5
    ) / F.lit(TWO60)
    return -F.log(-F.log(u))


def dsir_resample(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 4096,
    n_samples: int = 100,
    seed: str = "dsir",
    round_to: int = 6,
) -> DataFrame:
    """The actual IR in DSIR (arXiv:2302.03169 §3): sample ``n_samples``
    pool docs WITHOUT replacement with probability proportional to their
    importance weight, via the Gumbel top-k trick — ``key = logw + G`` with
    ``G`` standard Gumbel; the top-k keys are exactly a proportional
    without-replacement sample. The noise is derived from the portable
    md5 hash of ``seed:doc_id``, so the draw is deterministic, resume-safe,
    partitioning-independent, and reproducible by the DuckDB oracle.
    Map-only + ``TakeOrderedAndProject`` — zero shuffles, like
    :func:`dsir_select`. Returns (doc_id, logw, gkey) sorted by
    (gkey desc, doc_id)."""
    scored = _pool_scored(
        docs,
        id_col=id_col,
        text_col=text_col,
        target_col=target_col,
        target_value=target_value,
        n_buckets=n_buckets,
    )
    out = scored.select(
        "doc_id",
        F.round("__logw", round_to).alias("logw"),
        F.round(
            F.col("__logw") + _gumbel(F.col("doc_id"), seed), round_to
        ).alias("gkey"),
    )
    return out.orderBy(F.desc("gkey"), "doc_id").limit(n_samples)


def _scored_ctes(
    id_col: str, target_col: str, target_value: str, n_buckets: int
) -> str:
    """Shared DuckDB CTE chain ending in ``scored(doc_id, lw)`` with the
    UN-rounded log weight — dense count lists built with generate_series
    so bucket lookup and fold order mirror the Spark literal arrays
    exactly."""
    B = n_buckets
    h = hash60_sql("g")
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id, {target_col} AS t,
                   list_transform({_grams_sql("w")}, g -> ({h}) % {B}) AS bkts
            FROM (SELECT {id_col}, {target_col},
                         regexp_split_to_array(lower(trim(text)), '\\s+') AS w
                  FROM documents)
        ),
        tb AS (
            SELECT b, count(*) AS c
            FROM (SELECT unnest(bkts) AS b FROM base WHERE t = '{target_value}')
            GROUP BY 1
        ),
        rb AS (
            SELECT b, count(*) AS c
            FROM (SELECT unnest(bkts) AS b FROM base WHERE t != '{target_value}')
            GROUP BY 1
        ),
        tl AS (
            SELECT list(coalesce(tb.c, 0) ORDER BY s.i) AS ct,
                   (SELECT coalesce(sum(c), 0) FROM tb) AS tot
            FROM generate_series(0, {B - 1}) AS s(i) LEFT JOIN tb ON tb.b = s.i
        ),
        rl AS (
            SELECT list(coalesce(rb.c, 0) ORDER BY s.i) AS cr,
                   (SELECT coalesce(sum(c), 0) FROM rb) AS tot
            FROM generate_series(0, {B - 1}) AS s(i) LEFT JOIN rb ON rb.b = s.i
        ),
        scored AS (
            SELECT doc_id,
                   coalesce(list_sum(list_transform(bkts,
                       b -> ln(CAST(tl.ct[b + 1] AS DOUBLE) + 1.0)
                          - ln(CAST(rl.cr[b + 1] AS DOUBLE) + 1.0))), 0.0)
                   + len(bkts) * (ln(CAST(rl.tot + {B} AS DOUBLE))
                                - ln(CAST(tl.tot + {B} AS DOUBLE))) AS lw
            FROM base, tl, rl
            WHERE t != '{target_value}'
        )
    """


def dsir_select_sql(
    *,
    id_col: str = "doc_id",
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 4096,
    n_top: int = 100,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`dsir_select` over ``documents``."""
    ctes = _scored_ctes(id_col, target_col, target_value, n_buckets)
    return f"""
        {ctes}
        SELECT doc_id, round(lw, {round_to}) AS logw FROM scored
        ORDER BY logw DESC, doc_id LIMIT {n_top}
    """


def dsir_resample_sql(
    *,
    id_col: str = "doc_id",
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 4096,
    n_samples: int = 100,
    seed: str = "dsir",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`dsir_resample` — identical hash-derived
    Gumbel noise and association order."""
    ctes = _scored_ctes(id_col, target_col, target_value, n_buckets)
    hg = hash60_sql(f"'{seed}:' || CAST(doc_id AS VARCHAR)")
    g = f"-ln(-ln((CAST(({hg}) AS DOUBLE) + 0.5) / {TWO60!r}))"
    return f"""
        {ctes}
        SELECT doc_id, round(lw, {round_to}) AS logw,
               round(lw + ({g}), {round_to}) AS gkey
        FROM scored
        ORDER BY gkey DESC, doc_id LIMIT {n_samples}
    """
