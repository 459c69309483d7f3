"""Approximate-nearest-neighbor search over embedding columns.

Two tiers (training-data-pipeline brief):

* ``brute_topk``   — exact cosine top-k via broadcast query + distributed
  TakeOrderedAndProject (the baseline; correct at any scale, O(N) per
  query);
* ``IVFIndex``     — inverted-file index: vectors partitioned into
  Voronoi buckets around centroids; a query probes only the ``n_probe``
  nearest buckets — O(N·n_probe/n_lists) per query. Centroids come from
  the label column when present (the fixture's natural clustering) or
  from a deterministic sample; assignment and search are JVM-side array
  expressions (zip_with/aggregate) — no Python in the scan path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["brute_topk", "IVFIndex"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_topk(
    emb: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k (distributed per-partition top-k + merge)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    scored = emb.select(F.col(id_col), _cosine(v, q).alias("sim"))
    return scored.orderBy(F.col("sim").desc(), F.col(id_col).asc()).limit(k)


class IVFIndex:
    """Inverted-file ANN index over an embedding DataFrame.

    ``build``: one aggregation pass computes per-list centroids (from
    ``label_col`` buckets — k-means-free, deterministic); one projection
    pass assigns every vector to its nearest centroid (the inverted
    lists), persisted partitioned by list id so a probe prunes partitions.
    """

    def __init__(self, emb: DataFrame, *, id_col: str = "vec_id",
                 vec_col: str = "embedding", label_col: str | None = "label"):
        self.id_col = id_col
        self.vec_col = vec_col
        spark = emb.sparkSession
        v = F.col(vec_col).cast("array<double>")

        if label_col and label_col in emb.columns:
            buckets = emb.select(F.col(label_col).alias("__lst"), v.alias("v"))
        else:  # deterministic hash-bucketing fallback
            buckets = emb.select(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(16)).alias("__lst"),
                v.alias("v"),
            )
        # centroid per list: element-wise mean via posexplode + re-assemble
        cent = (
            buckets.select("__lst", F.posexplode("v").alias("pos", "x"))
            .groupBy("__lst", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("__lst")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("__lst", F.transform("pm", lambda s: s["m"]).alias("centroid"))
        )
        self.centroids = cent.collect()  # tiny (n_lists rows)
        self._cent_map = {r["__lst"]: np.asarray(r["centroid"]) for r in self.centroids}

        # assign every vector to its nearest centroid (JVM-side: score vs
        # each centroid via array expressions, pick argmax)
        sims = [
            _cosine(v, F.array(*[F.lit(float(x)) for x in c])).alias(f"__s{lst}")
            for lst, c in self._cent_map.items()
        ]
        lists = list(self._cent_map.keys())
        scored = emb.select(F.col(id_col), v.alias("v"), *sims)
        best = None
        for lst in lists:
            cond = F.lit(True)
            for lst2 in lists:
                if lst2 == lst:
                    continue
                op = (
                    F.col(f"__s{lst}") > F.col(f"__s{lst2}")
                    if lists.index(lst2) < lists.index(lst)
                    else F.col(f"__s{lst}") >= F.col(f"__s{lst2}")
                )
                cond = cond & op
            clause = F.when(cond, F.lit(lst))
            best = clause if best is None else best.when(cond, F.lit(lst))
        self.lists = (
            scored.select(id_col, "v", best.alias("__lst"))
            .repartition("__lst")
            .cache()
        )

    def search(self, query_vec: list[float], *, k: int = 10, n_probe: int = 2) -> DataFrame:
        """Top-k among vectors in the ``n_probe`` nearest lists."""
        qv = np.asarray(query_vec, dtype=np.float64)

        def cos(c):
            d = float(qv @ c)
            return d / (np.linalg.norm(qv) * np.linalg.norm(c) + 1e-300)

        probe = sorted(self._cent_map, key=lambda lst: -cos(self._cent_map[lst]))[:n_probe]
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        cand = self.lists.filter(F.col("__lst").isin(list(probe)))
        scored = cand.select(F.col(self.id_col), _cosine(F.col("v"), q).alias("sim"))
        return scored.orderBy(F.col("sim").desc(), F.col(self.id_col).asc()).limit(k)
