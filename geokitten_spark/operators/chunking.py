"""Sliding-window document chunking — the RAG / context-window prep op.

Retrieval corpora and long-context training sets both need documents cut
into overlapping fixed-size token windows (stride < window so no span is
lost at a boundary). This is the per-document counterpart of
``operators/packing.py`` (which concatenates ACROSS documents): packing
fills training shards, chunking feeds retrieval indexes and window-bounded
scoring.

100-TB shape: 100% Catalyst — tokenize (split), chunk-count arithmetic,
``explode(sequence(...))``, and per-chunk ``slice``/``array_join`` are
all codegen expressions, so the whole operator is ONE map stage with no
shuffle and no Python; output rows are (doc, chunk) keyed and ready for
a downstream embed/score pass. The chunk-count formula is exact integer
math (ceil of a small-int quotient — correctly-rounded double division,
identical in every engine), so the DuckDB twin is pure SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    docs: DataFrame,
    *,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Chunk k covers tokens [k*stride, k*stride + window); the count is
    1 + ceil((n - window) / stride) for n > window (the final window is
    allowed to be short, so every token is covered and consecutive
    chunks overlap by window - stride tokens).

    Returns (id, chunk_id, n_tokens, chunk_tokens, chunk_text)."""
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride <= window, got {stride}/{window}")
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )
    n = F.size(toks)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - F.lit(window)).cast("double") / F.lit(float(stride))).cast(
            "int"
        )
        + F.lit(1)
    )
    staged = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.cast("int").alias("n_tokens"),
        n_chunks.alias("__nc"),
    )
    chunk = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, F.lit(window)
    )
    return staged.select(
        id_col,
        "n_tokens",
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
        "__toks",
    ).select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        "n_tokens",
        F.size(chunk).cast("int").alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
