"""Quality-classifier tests (strict oracle parity is covered by the
driver-contract `quality_classifier` query; these pin the semantics)."""

import numpy as np
from pyspark.sql import functions as F

from geokitten_spark.operators.classifier import lr_fit, quality_classify

from tests.conftest import SF_SMOKE


def test_lr_fit_separates_and_is_deterministic():
    X = np.zeros((40, 8))
    X[:20, :4] = 0.25  # positives live in buckets 0-3
    X[20:, 4:] = 0.25  # negatives in buckets 4-7
    y = np.array([1.0] * 20 + [0.0] * 20)
    w1, b1 = lr_fit(X, y)
    w2, b2 = lr_fit(X, y)
    assert (w1 == w2).all() and b1 == b2  # bit-identical reruns
    p = 1.0 / (1.0 + np.exp(-(X @ w1 + b1)))
    assert p[:20].min() > 0.5 > p[20:].max()


def _planted(spark):
    good_vocab = "alpha beta gamma delta epsilon zeta eta theta".split()
    junk_vocab = "zork blarg quux fnord wibble plugh xyzzy grault".split()

    def doc(vocab, seed, n=30):
        return " ".join(vocab[(seed * 7 + i * 3) % len(vocab)] for i in range(n))

    rows = [(i, doc(good_vocab, i), "good") for i in range(40)]
    rows += [(100 + i, doc(junk_vocab, i), "junk") for i in range(40)]
    # held-out docs (ids past the training sample) from each vocabulary
    rows += [(500 + i, doc(good_vocab, i + 11), "good") for i in range(10)]
    rows += [(600 + i, doc(junk_vocab, i + 11), "junk") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_classifier_ranks_target_slice_first(spark):
    out = quality_classify(
        _planted(spark),
        positive_value="good",
        n_buckets=512,
        sample_n=80,  # trains on ids < 500 only; 5xx/6xx are held out
        n_top=100,
    ).collect()
    score = {r.doc_id: r.score for r in out}
    held_good = [score[i] for i in range(500, 510)]
    held_junk = [score[i] for i in range(600, 610)]
    assert min(held_good) > 0.5 > max(held_junk)  # generalizes off-sample


def test_classifier_partitioning_independence(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = [tuple(r) for r in quality_classify(docs, n_top=50).collect()]
    b = [
        tuple(r)
        for r in quality_classify(docs.repartition(7), n_top=50).collect()
    ]
    assert a == b
    assert all(0.0 <= s <= 1.0 for _, s in a)


def test_scoring_is_maponly_topk(spark):
    """Scoring must stay map-side: the only job beyond the sample collect
    is a TakeOrderedAndProject with no hash exchange of the corpus."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = (
        quality_classify(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan
