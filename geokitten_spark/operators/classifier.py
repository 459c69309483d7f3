"""fastText-style hashed linear quality classifier.

The standard web-corpus quality filter (GPT-3 appendix A, LLaMA §2,
CCNet): train a cheap linear classifier to recognize a curated target
slice (Wikipedia-like pages), score every crawled document, and keep
the high scorers. fastText's model is exactly logistic regression over
the MEAN of hashed bag-of-n-gram feature embeddings; with a one-hot
bucket embedding that collapses to ``sigmoid(bias + mean_g w[b(g)])``
— a dot product between the bucket-count histogram and a weight table.

Spark-first shape (same discipline as ``operators/dsir.py``):

* **Featurization is pure Catalyst** and SHARED with DSIR: lowercased
  whitespace unigrams + bigrams, md5-``hash60`` mod ``n_buckets``.
* **Training is control-plane on a deterministic sample** — the repo's
  PQIndex/SemDedup recipe: first ``sample_n`` docs by id, bucket arrays
  collected to the driver, full-batch gradient descent in float64 numpy
  with fixed iterations / learning rate and zero RNG. A fastText-grade
  quality model trains on thousands of labeled docs, not the corpus, so
  at 100 TB this stage is O(sample), never O(corpus).
* **Scoring is map-only, zero shuffles**: the trained weight table is
  inlined as ONE literal array<double> of length ``n_buckets``; each
  document folds its bucket array through a codegen ``aggregate``
  (left-to-right, the association order the DuckDB twin replicates),
  divides by its gram count, adds the bias, and applies the sigmoid.
* **Selection is a distributed top-k** (``TakeOrderedAndProject``).

The DuckDB twin retrains bit-identically: it reads the SAME sample via
the SAME SQL tokenization (proven hash-equal to Catalyst's by the DSIR
strict checks), producing the SAME integer count matrix, and runs the
SAME numpy ``lr_fit`` — so the inlined weights agree to the last ulp
and the scored output strict-hash-matches after rounding.

Reference parity: the reference repo has no classifier surface; this
extends the training-data-pipeline lane next to DSIR (domain match) and
the bigram-LM perplexity gate (fluency).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracles import ORACLE_SF_DIR, _duck
from .dedup import hash60, hash60_sql
from .dsir import _grams, _grams_sql

__all__ = ["lr_fit", "quality_classify", "quality_classify_sql"]


def lr_fit(
    X: np.ndarray, y: np.ndarray, *, iters: int = 30, lr: float = 0.5
) -> tuple[np.ndarray, float]:
    """Deterministic full-batch logistic regression (float64, zero RNG).

    Fixed ``iters`` sweeps of vanilla gradient descent from an all-zero
    start — the same sample always yields the same weights, so resumed
    jobs rescore identically and the oracle replica is bit-exact.
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = p - y
        w -= lr * (X.T @ g) / n
        b -= lr * float(g.mean())
    return w, b


def _count_matrix(bucket_lists, labels, n_buckets: int):
    """Dense mean-normalized count matrix from per-doc bucket-id lists."""
    X = np.zeros((len(bucket_lists), n_buckets), dtype=np.float64)
    for i, bkts in enumerate(bucket_lists):
        for b in bkts:
            X[i, b] += 1.0
        X[i] /= max(len(bkts), 1)
    return X, np.asarray(labels, dtype=np.float64)


def _bucketized(docs, id_col, text_col, label_col, n_buckets):
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("__lbl"),
        F.transform(
            _grams(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")),
            lambda g: F.pmod(hash60(g), F.lit(n_buckets)),
        ).alias("bkts"),
    )


def quality_classify(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    positive_value: str = "en",
    n_buckets: int = 4096,
    sample_n: int = 256,
    iters: int = 30,
    lr: float = 0.5,
    n_top: int = 200,
    round_to: int = 6,
) -> DataFrame:
    """Score every document with a quality classifier trained to
    recognize the ``label_col == positive_value`` slice; return the top
    ``n_top`` as (doc_id, score) sorted by (score desc, doc_id)."""
    base = _bucketized(docs, id_col, text_col, label_col, n_buckets)
    sample = base.orderBy("doc_id").limit(sample_n).collect()
    X, y = _count_matrix(
        [r.bkts for r in sample],
        [1.0 if r["__lbl"] == positive_value else 0.0 for r in sample],
        n_buckets,
    )
    w, bias = lr_fit(X, y, iters=iters, lr=lr)
    lit_w = F.lit([float(v) for v in w])
    acc = F.aggregate(
        F.col("bkts"),
        F.lit(0.0),
        lambda a, b: a + F.element_at(lit_w, (b + 1).cast("int")),
    )
    z = F.lit(float(bias)) + acc / F.greatest(F.size("bkts"), F.lit(1))
    scored = base.select(
        "doc_id", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_to).alias("score")
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(n_top)


def quality_classify_sql(
    sf_dir: str = ORACLE_SF_DIR,
    *,
    id_col: str = "doc_id",
    label_col: str = "lang",
    positive_value: str = "en",
    n_buckets: int = 4096,
    sample_n: int = 256,
    iters: int = 30,
    lr: float = 0.5,
    n_top: int = 200,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`quality_classify` — retrains the identical
    model from the identical sample via DuckDB-side tokenization, then
    scores in SQL with the weight table inlined as a literal list."""
    B = n_buckets
    h = hash60_sql("g")
    bkts_expr = f"list_transform({_grams_sql('w')}, g -> ({h}) % {B})"
    split_src = (
        f"SELECT {id_col} AS doc_id, {label_col} AS lbl, "
        f"regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents"
    )
    con = _duck(sf_dir)
    sample = con.sql(
        f"SELECT {bkts_expr} AS bkts, lbl FROM ({split_src}) "
        f"ORDER BY doc_id LIMIT {sample_n}"
    ).fetchall()
    X, y = _count_matrix(
        [r[0] for r in sample],
        [1.0 if r[1] == positive_value else 0.0 for r in sample],
        B,
    )
    w, bias = lr_fit(X, y, iters=iters, lr=lr)
    wlist = "[" + ", ".join(repr(float(v)) for v in w) + "]"
    return f"""
        WITH wt AS (SELECT {wlist}::DOUBLE[] AS w),
        base AS (
            SELECT doc_id, {bkts_expr} AS bkts FROM ({split_src})
        ),
        scored AS (
            SELECT doc_id,
                   round(1.0 / (1.0 + exp(-({bias!r} +
                       coalesce(list_sum(list_transform(bkts,
                           b -> wt.w[b + 1])), 0.0)
                       / greatest(len(bkts), 1)))), {round_to}) AS score
            FROM base, wt
        )
        SELECT doc_id, score FROM scored
        ORDER BY score DESC, doc_id LIMIT {n_top}
    """
