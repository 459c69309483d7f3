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
