"""HyperLogLog distinct-sketch tests (operators/sketch.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geokitten_spark.operators.sketch import (
    hll_distinct,
    hll_distinct_sql,
    hll_registers,
    hll_union_distinct,
)


def _toy(spark, n_keys=500, rows_per_key=3):
    rows = [
        (f"g{k % 4}", f"key-{k}")
        for k in range(n_keys)
        for _ in range(rows_per_key)
    ]
    return spark.createDataFrame(rows, "grp string, k string")


def test_hll_accuracy_and_multiplicity_invariance(spark):
    """Estimate within ~3 sigma (1.04/sqrt(m)) of truth, and duplicate
    rows must not move it (cardinality, not count)."""
    df = _toy(spark)
    est = {r.grp: r.hll_distinct for r in hll_distinct(df, "k", ["grp"]).collect()}
    est10 = {
        r.grp: r.hll_distinct
        for r in hll_distinct(
            df.withColumn("x", F.explode(F.array(*[F.lit(i) for i in range(10)]))),
            "k",
            ["grp"],
        ).collect()
    }
    assert est == est10
    for g, e in est.items():
        true = 125  # 500 keys over 4 groups
        assert abs(e - true) / true < 3 * 1.04 / np.sqrt(256), (g, e)


def test_hll_duckdb_twin_bit_identical(spark):
    """Small-range-corrected and raw paths both match DuckDB exactly."""
    import duckdb

    df = _toy(spark, n_keys=40)  # small: exercises the ln correction
    big = _toy(spark, n_keys=4000)  # large: raw harmonic-mean path
    con = duckdb.connect()
    for frame, name in [(df, "t_small"), (big, "t_big")]:
        con.register(name, frame.toPandas())
        got = {
            r.grp: r.hll_distinct
            for r in hll_distinct(frame, "k", ["grp"]).collect()
        }
        want = dict(con.sql(hll_distinct_sql("grp", "k", name)).fetchall())
        assert got == want, name


def test_hll_null_keys_ignored_and_m_validated(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y")], "grp string, k string"
    )
    [r] = hll_distinct(df, "k", ["grp"]).collect()
    assert r.hll_distinct > 0
    with pytest.raises(ValueError, match="power of two"):
        hll_distinct(df, "k", ["grp"], m=100)
    with pytest.raises(ValueError, match="power of two"):
        hll_distinct(df, "k", ["grp"], m=8)


def test_hll_union_merge_is_lossless(spark):
    """Max-merging per-slice register tables must be BIT-identical to the
    single-pass sketch — disjoint slices, overlapping slices, and a
    degenerate 1-slice union all collapse to the same estimate."""
    df = _toy(spark, n_keys=700)
    single = {r.grp: r.hll_distinct for r in hll_distinct(df, "k", ["grp"]).collect()}

    slices = [df.filter(F.pmod(F.xxhash64("k"), F.lit(3)) == i) for i in range(3)]
    regs = [hll_registers(s, "k", ["grp"]) for s in slices]
    merged = {
        r.grp: r.hll_distinct
        for r in hll_union_distinct(regs, ["grp"]).collect()
    }
    assert merged == single

    # overlap is idempotent: re-adding a slice's registers changes nothing
    overlapped = {
        r.grp: r.hll_distinct
        for r in hll_union_distinct(regs + [regs[0]], ["grp"]).collect()
    }
    assert overlapped == single

    one = {
        r.grp: r.hll_distinct
        for r in hll_union_distinct(
            [hll_registers(df, "k", ["grp"])], ["grp"]
        ).collect()
    }
    assert one == single

    with pytest.raises(ValueError, match="at least one"):
        hll_union_distinct([], ["grp"])


def test_hll_union_mixed_m_registers_bounded(spark):
    """A register table never exceeds m rows per group, whatever the
    slice size — the property that makes the merge shuffle O(slices*m)."""
    df = _toy(spark, n_keys=5000, rows_per_key=1)
    counts = (
        hll_registers(df, "k", ["grp"], m=64)
        .groupBy("grp")
        .count()
        .collect()
    )
    assert counts and all(r["count"] <= 64 for r in counts)


def test_hll_plan_shape(spark):
    """Both aggregates must partial-combine map-side (HashAggregate pairs),
    and nothing shuffles more than (group, register) rows."""
    df = _toy(spark)
    plan = (
        hll_distinct(df, "k", ["grp"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 4  # partial+final x two aggs
    assert "SinglePartition" not in plan
    assert "Python" not in plan  # pure Catalyst


def test_cms_one_sided_and_merge_lossless(spark):
    """cms_count >= exact for every key; sum-merging per-slice grids is
    bit-identical to the single-pass grid; unseen keys probe to 0."""
    from geokitten_spark.operators.sketch import cms_counters, cms_lookup, cms_merge

    df = _toy(spark, n_keys=400, rows_per_key=5)
    counters = cms_counters(df, "k", d=4, w=256)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probed = cms_lookup(counters, exact, "k", d=4, w=256).collect()
    assert probed and all(r.cms_count >= r.exact_cnt for r in probed)

    # the grid never exceeds d*w rows however large the input
    assert counters.count() <= 4 * 256

    # slice three ways, build per-slice grids, sum-merge: identical grid
    slices = [df.filter(F.pmod(F.xxhash64("k"), F.lit(3)) == i) for i in range(3)]
    merged = cms_merge([cms_counters(s, "k", d=4, w=256) for s in slices])
    single = {(r["__d"], r["__bucket"]): r.cnt for r in counters.collect()}
    assert {(r["__d"], r["__bucket"]): r.cnt for r in merged.collect()} == single

    # a dense grid never underestimates an unseen key either — it reads
    # collision mass, so only >= 0 holds there; the guaranteed-zero path
    # needs an empty bucket, i.e. a SPARSE grid (1 key, d=2, w=64: the
    # fixed hash60 puts "never-seen-key-xyz" in an untouched bucket)
    unseen = spark.createDataFrame([("never-seen-key-xyz",)], "k string")
    got = cms_lookup(counters, unseen, "k", d=4, w=256).collect()
    assert got[0].cms_count >= 0
    sparse = cms_counters(
        spark.createDataFrame([("only-key",)], "k string"), "k", d=2, w=64
    )
    got = cms_lookup(sparse, unseen, "k", d=2, w=64).collect()
    assert got[0].cms_count == 0

    with pytest.raises(ValueError, match="at least one"):
        cms_merge([])
    with pytest.raises(ValueError, match="d >= 1"):
        cms_counters(df, "k", d=0, w=256)


def test_cms_weighted_counts(spark):
    """weight_col sums weights instead of occurrences (token-weighted
    domain accounting shape); null keys are ignored."""
    from geokitten_spark.operators.sketch import cms_counters, cms_lookup

    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 7), (None, 99)], "k string, wt int"
    )
    counters = cms_counters(df, "k", d=3, w=64, weight_col="wt")
    keys = spark.createDataFrame([("a",), ("b",)], "k string")
    got = {r.k: r.cms_count for r in cms_lookup(counters, keys, "k", d=3, w=64).collect()}
    assert got["a"] >= 15 and got["b"] >= 7
    # total mass per hash row == total weight of non-null keys (22)
    per_row = {r["__d"]: r.total for r in
               counters.groupBy("__d").agg(F.sum("cnt").alias("total")).collect()}
    assert all(v == 22 for v in per_row.values())


def _qtoy(spark, n=4000):
    rows = [(f"g{i % 3}", (i * i * 7919) % 100000) for i in range(n)]
    return spark.createDataFrame(rows, "grp string, v long"), rows


def test_qhist_accuracy_and_exact_small_values(spark):
    """Bucket lower bound within 2^-(sig-1) relative error of the true
    inverted-CDF percentile; values < 2^sig are represented exactly."""
    from geokitten_spark.operators.sketch import qhist

    df, rows = _qtoy(spark)
    got = {(r.grp, r.percent): r.quantile_est for r in qhist(df, "v", ["grp"]).collect()}
    for g in ("g0", "g1", "g2"):
        vs = np.sort(np.array([v for gg, v in rows if gg == g]))
        for p in (50, 90, 99):
            true = vs[int(np.ceil(p * len(vs) / 100)) - 1]
            est = got[(g, p)]
            assert est <= true and true - est <= true * 2 ** -7, (g, p, est, true)

    small = spark.createDataFrame(
        [("a", v) for v in [0, 1, 5, 100, 255]], "grp string, v long"
    )
    exact = {r.percent: r.quantile_est for r in qhist(small, "v", ["grp"]).collect()}
    assert exact == {50: 5, 90: 255, 99: 255}  # sub-2^sig values land exactly


def test_qhist_duckdb_twin_bit_identical(spark):
    import duckdb

    from geokitten_spark.operators.sketch import qhist, qhist_sql

    df, _ = _qtoy(spark, n=1500)
    con = duckdb.connect()
    con.register("t", df.toPandas())
    got = sorted(tuple(r) for r in qhist(df, "v", ["grp"]).collect())
    want = sorted(tuple(r) for r in con.sql(qhist_sql("grp", "v", "t")).fetchall())
    assert got == want


def test_qhist_merge_lossless_and_bounded(spark):
    """Sum-merging per-slice bucket tables is bit-identical to the
    single-pass sketch; the bucket table stays <= (65-sig)*2^sig rows per
    group however large the corpus."""
    from geokitten_spark.operators.sketch import (
        qhist,
        qhist_counters,
        qhist_merge,
        qhist_quantiles,
    )

    df, _ = _qtoy(spark)
    single = sorted(tuple(r) for r in qhist(df, "v", ["grp"]).collect())
    slices = [df.filter(F.pmod(F.xxhash64("v"), F.lit(3)) == i) for i in range(3)]
    merged = qhist_quantiles(
        qhist_merge([qhist_counters(s, "v", ["grp"]) for s in slices]), ["grp"]
    )
    assert sorted(tuple(r) for r in merged.collect()) == single

    counts = qhist_counters(df, "v", ["grp"], sig=4).groupBy("grp").count().collect()
    assert counts and all(r["count"] <= 61 * 16 for r in counts)

    with pytest.raises(ValueError, match="at least one"):
        qhist_merge([])


def test_qhist_guards_and_plan_shape(spark):
    """Negative values raise, nulls are ignored, bad percents/sig raise;
    the build partial-combines map-side and nothing hits SinglePartition
    (the read windows per group over the tiny bucket table)."""
    from geokitten_spark.operators.sketch import qhist, qhist_counters

    with pytest.raises(Exception, match="negative"):
        qhist(
            spark.createDataFrame([("a", -5)], "grp string, v long"), "v", ["grp"]
        ).collect()
    df = spark.createDataFrame([("a", 7), ("a", None)], "grp string, v long")
    [r] = qhist_counters(df, "v", ["grp"]).collect()
    assert r.cnt == 1
    with pytest.raises(ValueError, match="percents"):
        qhist(df, "v", ["grp"], percents=[0])
    with pytest.raises(ValueError, match="percents"):
        qhist(df, "v", ["grp"], percents=[50.5])
    with pytest.raises(ValueError, match="sig"):
        qhist(df, "v", ["grp"], sig=1)

    big, _ = _qtoy(spark)
    plan = (
        qhist(big, "v", ["grp"])._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 2
    assert "SinglePartition" not in plan
    assert "Python" not in plan


# --- KMV / theta overlap -----------------------------------------------------


def _kmv_sets(spark, n_a=600, shared=400):
    """A = keys 0..n_a-1; B = keys (n_a-shared)..(n_a-shared)+n_a-1 —
    |A| = |B| = n_a, |A ∩ B| = shared."""
    a = spark.range(n_a).selectExpr("CAST(id AS STRING) AS key")
    b = spark.range(n_a).selectExpr(
        f"CAST(id + {n_a - shared} AS STRING) AS key"
    )
    return a, b


def test_kmv_overlap_estimation_mode_accuracy(spark):
    from geokitten_spark.operators.sketch import kmv_overlap

    a, b = _kmv_sets(spark)
    r = kmv_overlap(a, b, "key", k=256).collect()[0]
    assert r.theta < (1 << 60)  # both sketches full -> estimation mode
    for est, exact in ((r.est_a, 600), (r.est_b, 600),
                       (r.est_union, 800), (r.est_intersect, 400)):
        assert abs(est - exact) / exact < 0.25, (est, exact)
    assert abs(r.jaccard_pct - 50) <= 12  # exact jaccard = 400/800


def test_kmv_overlap_exact_mode_below_k(spark):
    from geokitten_spark.operators.sketch import kmv_overlap

    a, b = _kmv_sets(spark, n_a=100, shared=30)
    r = kmv_overlap(a, b, "key", k=256).collect()[0]
    assert r.theta == (1 << 60)  # exact mode
    assert (r.est_a, r.est_b, r.est_union, r.est_intersect) == (
        100, 100, 170, 30,
    )
    assert r.jaccard_pct == (100 * 30) // 170


def test_kmv_overlap_disjoint_and_identical(spark):
    from geokitten_spark.operators.sketch import kmv_overlap

    a, _ = _kmv_sets(spark, n_a=50)
    d = spark.range(50).selectExpr("CAST(id + 10000 AS STRING) AS key")
    r = kmv_overlap(a, d, "key", k=64).collect()[0]
    assert r.est_intersect == 0 and r.jaccard_pct == 0
    r = kmv_overlap(a, a, "key", k=64).collect()[0]
    assert r.est_a == r.est_b == r.est_union == r.est_intersect
    assert r.jaccard_pct == 100


def test_kmv_sketch_plan_is_takeordered(spark):
    """The build must be per-partition top-k (TakeOrdered), never a
    global sort; nothing in the lane touches Python."""
    from geokitten_spark.operators.sketch import kmv_overlap, kmv_sketch

    a, b = _kmv_sets(spark)
    plan = kmv_sketch(a, "key", 256)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan
    full = kmv_overlap(a, b, "key", 256)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in full
