"""SemDedup operator tests (strict oracle parity is covered by the
driver-contract `semdedup` query; these pin the operator's semantics)."""

import numpy as np
from pyspark.sql import functions as F

from geokitten_spark.fixtures import (
    _NEARDUP_ID_OFFSET,
    _NEARDUP_STRIDE,
    embedding_neardup_corpus,
)
from geokitten_spark.operators.semdedup import (
    assign_clusters,
    kmeans_fit,
    semdedup,
)

from tests.conftest import SF_SMOKE


def _corpus(spark):
    return embedding_neardup_corpus(spark, SF_SMOKE)


def test_perturbed_copies_are_removed_and_colocated(spark):
    """Every injected near-dup (base + first-component×1.05) lands in its
    base vector's cluster and is removed; its base (smaller id) is kept."""
    out = semdedup(_corpus(spark), k=10, threshold=0.99).collect()
    by_id = {r.vec_id: r for r in out}
    perturbed = [r for r in out if r.vec_id >= _NEARDUP_ID_OFFSET]
    assert perturbed, "fixture must inject near-dups"
    for r in perturbed:
        base = by_id[r.vec_id - _NEARDUP_ID_OFFSET]
        assert r.cluster == base.cluster
        assert r.removed
    # bases of perturbed copies: kept unless they have their own smaller-id
    # near-dup — in this fixture cluster noise keeps non-twin sims < 0.99
    for r in perturbed:
        assert not by_id[r.vec_id - _NEARDUP_ID_OFFSET].removed


def test_removed_iff_smaller_id_partner_above_threshold(spark):
    """Brute-force re-check of the keep-first rule on collected data."""
    emb = _corpus(spark)
    out = semdedup(emb, k=10, threshold=0.99).collect()
    vecs = {
        r["vec_id"]: np.asarray(r["v"], dtype=np.float64)
        for r in emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).collect()
    }
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r)
    for members in by_cluster.values():
        members.sort(key=lambda r: r.vec_id)
        for j, rj in enumerate(members):
            vj = vecs[rj.vec_id]
            expect = any(
                float(
                    vecs[ri.vec_id]
                    @ vj
                    / (
                        np.linalg.norm(vecs[ri.vec_id]) * np.linalg.norm(vj)
                    )
                )
                >= 0.99 - 1e-12
                for ri in members[:j]
            )
            assert expect == rj.removed, rj.vec_id


def test_assignment_is_map_only(spark):
    """The cluster-learning pass must not shuffle the corpus: the
    assignment plan contains ZERO exchanges."""
    emb = _corpus(spark)
    sample = np.array(
        [
            r[0]
            for r in emb.orderBy("vec_id")
            .limit(2048)
            .select(F.col("embedding").cast("array<double>"))
            .collect()
        ]
    )
    C = kmeans_fit(sample, k=10)
    plan = assign_clusters(emb, C)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_assign_modes_literal_vs_arrow_parity(spark):
    """The Arrow-broadcast assignment (the paper-scale-k path, where a
    k×d literal would be a ~60 MB codegen constant) must agree with the
    literal codegen mode on EVERY row — the pandas kernel replicates the
    fold's per-dimension IEEE accumulation order exactly. Also: 'auto'
    flips to arrow above the cell threshold, and the arrow plan is still
    exchange-free (map-only)."""
    from geokitten_spark.operators.semdedup import _LITERAL_MAX_CELLS

    emb = _corpus(spark)
    sample = np.array(
        [
            r[0]
            for r in emb.orderBy("vec_id")
            .limit(2048)
            .select(F.col("embedding").cast("array<double>"))
            .collect()
        ]
    )
    C = kmeans_fit(sample, k=10)
    lit = {
        r.vid: r.cluster
        for r in assign_clusters(emb, C, mode="literal").collect()
    }
    arw = {
        r.vid: r.cluster
        for r in assign_clusters(emb, C, mode="arrow").collect()
    }
    assert lit == arw
    plan = (
        assign_clusters(emb, C, mode="arrow")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    # auto-mode routing: a matrix over the threshold picks arrow
    big_k = _LITERAL_MAX_CELLS // C.shape[1] + 1
    big = np.tile(C[:1], (big_k, 1))
    plan_big = (
        assign_clusters(emb, big, mode="auto")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan_big or "Python" in plan_big
    plan_small = (
        assign_clusters(emb, C, mode="auto")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan_small


def test_semdedup_verdicts_identical_under_arrow_assign(spark):
    """End-to-end: semdedup(assign_mode='arrow') returns the SAME
    (vec_id, cluster, removed) verdicts as the literal default."""
    a = semdedup(_corpus(spark), k=10, threshold=0.99).collect()
    b = semdedup(
        _corpus(spark), k=10, threshold=0.99, assign_mode="arrow"
    ).collect()
    assert {(r.vec_id, r.cluster, r.removed) for r in a} == {
        (r.vec_id, r.cluster, r.removed) for r in b
    }


def test_kmeans_fit_deterministic_and_separates_fixture(spark):
    emb = _corpus(spark)
    sample = np.array(
        [
            r[0]
            for r in emb.orderBy("vec_id")
            .limit(2048)
            .select(F.col("embedding").cast("array<double>"))
            .collect()
        ]
    )
    C1 = kmeans_fit(sample, k=10)
    C2 = kmeans_fit(sample.copy(), k=10)
    assert np.array_equal(C1, C2)
    # the distributed literal-centroid assignment must agree row-for-row
    # with the numpy fold-order replica (same first-max tie-break)
    rows = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.v for r in rows], dtype=np.float64)
    sims = np.zeros((len(ids), len(C1)))
    for c in range(len(C1)):
        dot = np.zeros(len(ids))
        nv = np.zeros(len(ids))
        nc = 0.0
        for d in range(mat.shape[1]):
            dot += mat[:, d] * C1[c, d]
            nv += mat[:, d] * mat[:, d]
            nc += C1[c, d] * C1[c, d]
        sims[:, c] = dot / (np.sqrt(nv) * np.sqrt(nc))
    expect = {int(i): int(c) for i, c in zip(ids, np.argmax(sims, axis=1))}
    got = {r.vid: r.cluster for r in assign_clusters(emb, C1).collect()}
    assert got == expect


def test_pair_scan_single_shuffle_no_self_join(spark):
    """Round-4 scale fix: the pair scan is a grouped applyInPandas over
    the cluster id — each embedding crosses EXACTLY ONE exchange, once
    per member (never per pair), and no join duplicates vectors into
    O(cluster²) candidate rows."""
    plan = (
        semdedup(_corpus(spark), k=10, threshold=0.99)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "FlatMapGroupsInPandas" in plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in plan, join


def test_auto_k_scales_with_corpus(spark):
    """k=None sizes the codebook as ceil(n / target_cluster_size) so the
    expected cluster size — and the per-group O(c²) work — stays constant
    as the corpus grows."""
    emb = _corpus(spark)
    n = emb.count()
    out = semdedup(emb, k=None, target_cluster_size=50, threshold=0.99)
    k_eff = out.select(F.countDistinct("cluster")).first()[0]
    assert 2 <= k_eff <= -(-n // 50)
    # and every injected twin still lands with (and removes against) its base
    rows = {r.vec_id: r for r in out.collect()}
    twins = [i for i in rows if i >= _NEARDUP_ID_OFFSET]
    assert twins
    assert all(rows[i].removed for i in twins)
    assert all(rows[i].cluster == rows[i - _NEARDUP_ID_OFFSET].cluster for i in twins)


def test_kmeans_clamps_k_and_returns_unit_centroids():
    """ADVICE round-3: k > sample size clamps (one centroid per row, no
    garbage padding) and spherical re-normalization keeps every centroid
    unit-length after each sweep, so L2 argmin == cosine argmax at every
    iteration, not just the first."""
    rng_free = np.array(
        [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]], dtype=np.float64
    )
    C = kmeans_fit(rng_free, k=10, iters=3)
    assert C.shape == (3, 2)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)
