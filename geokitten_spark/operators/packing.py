"""Sequence packing for LLM training-data pipelines.

Training consumes fixed-length token sequences, not documents: the
canonical GPT-style preparation concatenates the (deterministically
shuffled) corpus into one token stream and chunks it into ``seq_len``
blocks. The per-document packing metadata — stream offset, first/last
sequence index, sequence span — is what a shard writer needs to
materialize training examples, and it is a pure global prefix sum over
token counts in the shuffle order.

Scale design (the naive form is ONE window over the whole corpus — a
single reducer at 10^12 docs):

* order is (hash60 bucket, key): a pure function of the key, so retries,
  resume, and different parallelism reproduce byte-identical packing,
  and the hash order IS the training shuffle;
* two-phase prefix sum: (1) per-coarse-bucket token sums — one tiny
  aggregate (``n_buckets`` output rows) with map-side combine; (2) the
  driver prefix-sums the bucket table (O(n_buckets)) and broadcasts the
  per-bucket stream offsets; each doc's offset = its bucket's offset +
  a within-bucket window cumsum. The window partitions by bucket, so
  the largest sequential task is ~n_docs / n_buckets rows — size
  ``n_buckets`` to the corpus (default 256; use 2^16 at 10^12 docs).

Both phases are SQL-expressible; ``pack_sequences_sql`` is the
engine-portable DuckDB twin (plain global window — the oracle runs at
test scale)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hash60, hash60_sql

__all__ = ["pack_sequences", "pack_sequences_sql"]

_HASH_SPACE = 1_000_000  # matches operators/sampling._BUCKETS


def _order_hash(key, salt: str):
    return F.pmod(
        hash60(F.concat(F.lit(f"{salt}:"), key.cast("string"))),
        F.lit(_HASH_SPACE),
    )


def _order_hash_sql(key_expr: str, salt: str) -> str:
    h = hash60_sql(f"'{salt}:' || CAST({key_expr} AS VARCHAR)")
    return f"(({h}) % {_HASH_SPACE})"


def pack_sequences(
    df: DataFrame,
    *,
    key_col: str,
    tokens_col: str,
    seq_len: int,
    n_buckets: int = 256,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk packing metadata per document.

    Documents are laid out in (hash, key) order — the deterministic
    training shuffle — and the concatenated token stream is chunked
    into ``seq_len``-token sequences. Per input row (rows with
    ``tokens_col`` <= 0 are dropped; they occupy no stream space):

    * ``stream_offset`` — tokens before this doc in the stream;
    * ``first_seq`` / ``last_seq`` — sequence indices this doc spans;
    * ``n_seqs`` — ``last_seq - first_seq + 1`` (>1 means the doc
      crosses a chunk boundary).
    """
    from pyspark.sql import Window

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    width = -(-_HASH_SPACE // n_buckets)  # ceil: bucket order == hash order
    h = _order_hash(F.col(key_col), salt)
    t = (
        df.filter(F.col(tokens_col) > 0)
        .withColumn("__h", h)
        .withColumn("__b", (F.col("__h") / F.lit(width)).cast("long"))
    )

    # phase 1: per-bucket token sums (<= n_buckets rows on the driver)
    sums = {
        int(r["__b"]): int(r["__t"])
        for r in t.groupBy("__b").agg(F.sum(tokens_col).alias("__t")).collect()
    }
    # phase 2: driver prefix in bucket order, broadcast back
    run = 0
    offsets = []
    for b in sorted(sums):
        offsets.append((b, run))
        run += sums[b]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offsets or [(None, None)], "__b long, __bucket_off long"
    ).filter(F.col("__b").isNotNull())

    w = (
        Window.partitionBy("__b")
        .orderBy(F.col("__h").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_in = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    # materialize stream_offset once (a single window sum in the plan),
    # then derive the chunk indices from the column; `div` keeps the
    # arithmetic in exact int64 (offsets are non-negative, so div==floor)
    # instead of FLOOR(double) which loses exactness past 2^53 tokens
    first = F.expr(f"stream_offset div {seq_len}")
    return (
        t.join(F.broadcast(off_df), on="__b")
        .withColumn("stream_offset", (F.col("__bucket_off") + cum_in).cast("long"))
        .withColumn("first_seq", first.cast("long"))
        .withColumn(
            "last_seq",
            F.expr(f"(stream_offset + {tokens_col} - 1) div {seq_len}").cast("long"),
        )
        .withColumn(
            "n_seqs", (F.col("last_seq") - F.col("first_seq") + F.lit(1)).cast("long")
        )
        .drop("__h", "__b", "__bucket_off")
    )


def pack_sequences_sql(
    select_cols: str,
    from_clause: str,
    key_expr: str,
    tokens_expr: str,
    seq_len: int,
    *,
    salt: str = "pack",
) -> str:
    """DuckDB oracle twin: same (hash, key) order, plain global window
    (test scale). ``select_cols`` are passed through; packing columns
    are appended with the exact Spark-side names."""
    h = _order_hash_sql(key_expr, salt)
    return f"""
        SELECT {select_cols},
               CAST(stream_offset AS BIGINT) AS stream_offset,
               CAST(stream_offset // {seq_len} AS BIGINT) AS first_seq,
               CAST((stream_offset + __tok - 1) // {seq_len} AS BIGINT) AS last_seq,
               CAST((stream_offset + __tok - 1) // {seq_len}
                    - stream_offset // {seq_len} + 1 AS BIGINT) AS n_seqs
        FROM (
            SELECT *,
                   COALESCE(SUM(__tok) OVER (
                       ORDER BY __h ASC, {key_expr} ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS stream_offset
            FROM (
                SELECT *, {h} AS __h, CAST({tokens_expr} AS BIGINT) AS __tok
                FROM {from_clause}
                WHERE {tokens_expr} > 0
            )
        )
    """
