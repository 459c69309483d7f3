"""DSIR importance-selection tests (strict oracle parity is covered by
the driver-contract `dsir_select` query; these pin operator semantics)."""

from pyspark.sql import functions as F

from geokitten_spark.operators.dsir import dsir_resample, dsir_select

from tests.conftest import SF_SMOKE


def _planted(spark):
    """Target = docs about 'alpha beta gamma ...'; pool mixes docs drawn
    from the target vocabulary with docs from a disjoint vocabulary."""
    tgt_vocab = "alpha beta gamma delta epsilon zeta eta theta".split()
    alien_vocab = "zork blarg quux fnord wibble plugh xyzzy grault".split()

    def doc(vocab, seed, n=30):
        return " ".join(vocab[(seed * 7 + i * 3) % len(vocab)] for i in range(n))

    rows = []
    for i in range(40):  # target slice
        rows.append((i, doc(tgt_vocab, i), "tgt"))
    for i in range(20):  # pool: target-like
        rows.append((100 + i, doc(tgt_vocab, i + 3), "pool"))
    for i in range(20):  # pool: alien
        rows.append((200 + i, doc(alien_vocab, i), "pool"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_selects_target_like_docs_first(spark):
    out = dsir_select(
        _planted(spark), target_value="tgt", n_top=20, n_buckets=512
    ).collect()
    ids = [r.doc_id for r in out]
    assert len(ids) == 20
    # all 20 target-vocabulary pool docs outrank every alien doc
    assert all(100 <= i < 200 for i in ids), ids
    # and weights are positive for target-like, i.e. genuinely ranked
    assert all(r.logw > 0 for r in out)


def test_partitioning_independence(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = [(r.doc_id, r.logw) for r in dsir_select(docs, n_top=50).collect()]
    b = [
        (r.doc_id, r.logw)
        for r in dsir_select(docs.repartition(7), n_top=50).collect()
    ]
    assert a == b


def test_resample_prefers_heavy_docs_but_is_stochastic(spark):
    """Gumbel top-k: the draw is weight-proportional (target-like docs
    dominate across seeds) yet genuinely a sample — different seeds give
    different sets, and logw ordering is NOT simply truncated."""
    docs = _planted(spark)
    sets = []
    for seed in ("a", "b", "c"):
        out = dsir_resample(
            docs, target_value="tgt", n_samples=10, n_buckets=512, seed=seed
        ).collect()
        ids = [r.doc_id for r in out]
        assert len(set(ids)) == 10  # without replacement
        # weight gap between vocabularies is huge vs Gumbel noise (std~1.3)
        assert sum(1 for i in ids if 100 <= i < 200) >= 8, (seed, ids)
        sets.append(frozenset(ids))
    assert len(set(sets)) > 1  # seeds actually change the draw


def test_resample_deterministic_across_partitioning(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = [tuple(r) for r in dsir_resample(docs, n_samples=30).collect()]
    b = [
        tuple(r)
        for r in dsir_resample(docs.repartition(7), n_samples=30).collect()
    ]
    assert a == b
    # gkey = logw + gumbel, so gkey-logw (the noise) is finite and varied
    noises = {round(g - w, 4) for _, w, g in a}
    assert len(noises) > 20


def test_selection_is_topk_not_global_window(spark):
    """Scoring must stay map-side and selection must compile to a
    distributed TakeOrderedAndProject — never a single-partition sort
    or a hash shuffle of the pool."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = (
        dsir_select(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan
