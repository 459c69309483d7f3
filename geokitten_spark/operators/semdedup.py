"""SemDedup: semantic deduplication via k-means + within-cluster cosine.

The published SemDedup pipeline (Abbas et al. 2023, arXiv:2303.09540)
prunes web-scale corpora by (1) k-means-clustering document embeddings,
(2) computing pairwise cosine similarity ONLY within each cluster, and
(3) keeping one representative per near-duplicate group. Clustering
bounds the pair scan: with k chosen so clusters hold ~n/k items, the
all-pairs step is O(n²/k) instead of O(n²), and every pair computation
is co-located after a single shuffle on the (int) cluster id.

Spark-first shape here:

* **Training** follows the repo's PQIndex recipe (`operators/ann.py`):
  deterministic Lloyd on a driver-side sample — first ≤``sample_n``
  vectors by id, first-k init, fixed iterations, no RNG — so the
  centroids are bit-replicable by the numpy oracle path and a resumed
  job retrains identically. At 10^12 rows the full corpus only ever
  runs ASSIGN, exactly like any web-scale k-means deployment.
* **Assignment is map-only, zero shuffle**: the k×d centroid matrix is
  inlined as a literal array-of-arrays column; per-row cosine against
  each centroid is a codegen ``transform`` + fold, and the argmax is
  ``array_position(sims, array_max(sims))`` (first-max tie-break — the
  deterministic rule the oracle replicates). No crossJoin, no groupBy:
  the corpus is touched once and never shuffled to learn its cluster.
* **Pair scan** self-joins on the int cluster id (ONE corpus shuffle per
  side), prunes ``a < b``, and verifies with the exact fold-cosine.
  A document is ``removed`` iff some SMALLER id in its cluster is
  ≥ ``threshold``-similar — "keep the first seen per duplicate group",
  the same deterministic keep-rule the exact-dedup operator uses.

Skew note: at toy k every cluster is a fat shuffle key; at production
scale k grows with n (the paper uses ~11k clusters for LAION-440M), so
cluster keys are plentiful and AQE splits any residual hot cluster.

Reference parity: the reference repo has no embedding operators — this
extends the training-data-pipeline surface (round brief) alongside
``operators/dedup.py``'s MinHash/SimHash/LSH families.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _dot, _norm

__all__ = ["kmeans_fit", "semdedup"]


def kmeans_fit(
    mat: np.ndarray, *, k: int = 10, iters: int = 5
) -> np.ndarray:
    """Deterministic Lloyd over a float64 sample matrix.

    First-k init, fixed ``iters`` sweeps, empty clusters keep their
    previous center — no RNG anywhere, so the same sample always yields
    the same centroids (resume-safe, oracle-replicable). Vectors are
    L2-normalized first so squared-L2 argmin == cosine argmax.
    """
    X = np.asarray(mat, dtype=np.float64)
    X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-300)
    C = X[:k].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C


def _fit_from_df(
    emb: DataFrame, *, id_col: str, vec_col: str, k: int, iters: int, sample_n: int
) -> np.ndarray:
    sample = (
        emb.orderBy(id_col)
        .limit(sample_n)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    return kmeans_fit(
        np.array([r[0] for r in sample], dtype=np.float64), k=k, iters=iters
    )


def assign_clusters(
    emb: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, v): map-only centroid argmax via a literal centroid
    array — cosine per centroid is a codegen fold, cluster =
    first-position-of-max (0-based). Zero shuffles, zero Python."""
    cents = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in centroids[c]])
            for c in range(len(centroids))
        ]
    )
    v = F.col(vec_col).cast("array<double>")
    sims = F.transform(cents, lambda c: _dot(v, c) / (_norm(v) * _norm(c)))
    cluster = (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
    return emb.select(
        F.col(id_col).alias("vid"), cluster.alias("cluster"), v.alias("v")
    )


def semdedup(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    iters: int = 5,
    sample_n: int = 2048,
    threshold: float = 0.99,
) -> DataFrame:
    """Per-document SemDedup verdicts: (vec_id, cluster, removed).

    ``removed`` is true iff a smaller-id member of the same k-means
    cluster has cosine ≥ ``threshold`` — the deterministic
    keep-first-per-group rule. One corpus pass for assignment (map-only)
    + one cluster-keyed self-join for the pair scan.
    """
    C = _fit_from_df(
        emb, id_col=id_col, vec_col=vec_col, k=k, iters=iters, sample_n=sample_n
    )
    assigned = assign_clusters(emb, C, id_col=id_col, vec_col=vec_col)
    a = assigned.select(
        F.col("cluster"), F.col("vid").alias("vec_a"), F.col("v").alias("va")
    )
    b = assigned.select(
        F.col("cluster"), F.col("vid").alias("vec_b"), F.col("v").alias("vb")
    )
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    removed_ids = (
        a.join(b, on="cluster")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(sim >= F.lit(threshold))
        .select(F.col("vec_b").alias("vid"))
        .distinct()
    )
    return (
        assigned.join(removed_ids.withColumn("__rm", F.lit(True)), on="vid", how="left")
        .select(
            F.col("vid").alias(id_col),
            F.col("cluster"),
            F.coalesce(F.col("__rm"), F.lit(False)).alias("removed"),
        )
    )
