"""Link graph + integer-exact PageRank (operators/linkgraph.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geokitten_spark.fixtures import (
    LINK_DOMAIN,
    LINK_MULT,
    LINK_STEP,
    N_LINKS,
    link_edges_sql,
    web_documents,
)
from geokitten_spark.operators.linkgraph import (
    RANK_UNIT,
    extract_links,
    link_degrees,
    pagerank,
    pagerank_sql,
)

from tests.conftest import SF_SMOKE


def test_extract_links_equals_target_formula(spark):
    docs = web_documents(spark, SF_SMOKE)
    got = {
        (r.src, r.dst) for r in extract_links(docs).collect()
    }
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    want = {
        (i, (i * LINK_MULT + LINK_STEP * k) % LINK_DOMAIN)
        for i in ids
        for k in range(1, N_LINKS + 1)
    }
    assert got == want
    assert len(got) == len(ids) * N_LINKS  # no dup targets in the fixture


def test_degrees_out_is_three_and_in_sums_to_edges(spark):
    docs = web_documents(spark, SF_SMOKE)
    nodes = docs.select(F.col("doc_id").alias("node"))
    deg = link_degrees(nodes, extract_links(docs)).collect()
    assert all(r.out_deg == N_LINKS for r in deg)
    assert sum(r.in_deg for r in deg) == len(deg) * N_LINKS


def _duck_pagerank(nodes_rows, edges_rows, n_iters=5):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?)",
                    [(n,) for n in nodes_rows])
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges_rows)
    q = pagerank_sql("SELECT doc_id AS node FROM documents",
                     "SELECT src, dst FROM e", n_iters=n_iters)
    return dict(con.execute(
        q + f"\nSELECT node, rank FROM r{n_iters}").fetchall())


def test_pagerank_matches_duckdb_twin_on_handmade_graph(spark):
    # 4-node graph with a hub, a dangling node (3), and a 2-cycle
    nodes = [0, 1, 2, 3]
    edges = [(0, 1), (0, 2), (1, 0), (2, 0), (2, 3)]
    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(ndf, edf, n_iters=5).collect()}
    want = _duck_pagerank(nodes, edges, n_iters=5)
    assert got == want
    # hub 0 outranks the leaf it feeds twice-removed
    assert got[0] > got[3]
    # integer mass never exceeds the starting budget (floors only lose)
    assert sum(got.values()) <= RANK_UNIT


def test_pagerank_is_partitioning_invariant(spark):
    docs = web_documents(spark, SF_SMOKE)
    nodes = docs.select(F.col("doc_id").alias("node"))
    edges = extract_links(docs)
    a = pagerank(nodes, edges, n_iters=3).collect()
    b = pagerank(
        nodes.repartition(7), edges.repartition(13, "dst"), n_iters=3
    ).collect()
    assert sorted((r.node, r.rank) for r in a) == sorted(
        (r.node, r.rank) for r in b
    )


def test_pagerank_plan_stays_jvm_side(spark):
    docs = web_documents(spark, SF_SMOKE)
    nodes = docs.select(F.col("doc_id").alias("node"))
    ranks = pagerank(nodes, extract_links(docs), n_iters=2,
                     checkpoint_every=0)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure Catalyst end to end
    assert "SinglePartition" not in plan


def _duck_pagerank_redist(nodes_rows, edges_rows, n_iters=5):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?)",
                    [(n,) for n in nodes_rows])
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges_rows)
    q = pagerank_sql("SELECT doc_id AS node FROM documents",
                     "SELECT src, dst FROM e", n_iters=n_iters,
                     dangling="redistribute")
    return dict(con.execute(
        q + f"\nSELECT node, rank FROM r{n_iters}").fetchall())


def test_pagerank_redistribute_matches_twin_and_conserves_mass(spark):
    """dangling='redistribute' (textbook PageRank): the dangling node's
    rank is shared out each iteration instead of decaying. On the
    handmade graph with dangling node 3 the twin matches bit-for-bit,
    total mass stays within n-per-division floor loss of the budget
    (decay mode leaks the whole dangling share), and every node is at
    least as ranked as under decay."""
    nodes = [0, 1, 2, 3]
    edges = [(0, 1), (0, 2), (1, 0), (2, 0), (2, 3)]
    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.rank
        for r in pagerank(ndf, edf, n_iters=5,
                          dangling="redistribute").collect()
    }
    assert got == _duck_pagerank_redist(nodes, edges, n_iters=5)
    decay = {r.node: r.rank for r in pagerank(ndf, edf, n_iters=5).collect()}
    assert all(got[n] >= decay[n] for n in nodes)
    assert sum(got.values()) > sum(decay.values())
    # each iteration floors at most ~(n + 2) units per node across the
    # div steps; with 4 nodes / 5 iterations the retained mass must be
    # within a few hundred units of the full budget
    assert RANK_UNIT - sum(got.values()) < 1000
    # no dangling nodes -> the two modes agree exactly
    full_edges = edges + [(3, 0)]
    edf2 = spark.createDataFrame(full_edges, "src long, dst long")
    a = {r.node: r.rank for r in pagerank(ndf, edf2, n_iters=3).collect()}
    b = {
        r.node: r.rank
        for r in pagerank(ndf, edf2, n_iters=3,
                          dangling="redistribute").collect()
    }
    assert a == b


def test_pagerank_empty_nodes_raises(spark):
    ndf = spark.createDataFrame([], "node long")
    edf = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty"):
        pagerank(ndf, edf)
