"""Web link graph: href extraction, degrees, and integer-exact PageRank.

A web-scale corpus pipeline needs the link graph for crawl prioritization,
spam/host weighting, and quality signals (Common Crawl publishes exactly
this as its host-level web graph). Three operators:

* :func:`extract_links` — map-only href extraction from the ``html``
  column (``regexp_extract_all`` + ``explode``; pure Catalyst, no Python).
* :func:`link_degrees` — per-node in/out degree (two 8-byte-key count
  aggregates map-side combined, one join).
* :func:`pagerank` — damped PageRank over N fixed iterations in EXACT
  int64 arithmetic: ranks live in integer "rank units" (1e12 split evenly
  across nodes), per-edge contributions use integer division
  ``rank div out_degree``, and the damping update is
  ``((100-d)*base) div 100 + (d*sum) div 100``. Because every step is
  integer math, the result is independent of partitioning AND summation
  order — which is what makes a bit-identical DuckDB twin
  (:func:`pagerank_sql`, the same chain as N chained CTEs) possible.
  Floating-point PageRank cannot be oracle-checked this way: a
  distributed double sum is order-dependent.

Scale shape (10^12 edges, 10^9 nodes): each iteration is one shuffle
join of edges against the rank table on ``src`` (both sides hash-
partitioned on the same key, so AQE reuses the exchange) followed by one
map-side-combined SUM on ``dst``; the rank/degree tables are O(nodes)
rows of two int64s. The iteration loop grows the logical plan linearly,
so ranks are ``localCheckpoint``-ed every ``checkpoint_every`` iterations
(same lineage-bounding discipline as ``dedup.connected_components``).
Fixed iteration count is a deliberate contract: production would add a
L1-delta stopping rule on top of the same integer update.

Fixture edges: every page carries ``<link href="doc://T">`` tags whose
targets are a pure function of doc_id (``fixtures.link_target``), so the
extracted graph equals the formula-derived graph the oracle uses — if
extraction drifted, every downstream rank would hash-mismatch.

Reference parity: the reference has no link/graph surface
(``geokitten/__init__.py`` exports only geometry/KML classes); this lane
is north_rule (Common-Crawl-style corpus) surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_links",
    "link_degrees",
    "pagerank",
    "pagerank_sql",
    "RANK_UNIT",
]

RANK_UNIT = 1_000_000_000_000  # 1e12 integer rank units of total base mass

_LINK_RE = r"doc://(\d+)"


def extract_links(webdocs: DataFrame) -> DataFrame:
    """(doc_id, html) -> (src, dst) edge list via one codegen pass.

    ``regexp_extract_all`` runs JVM-side over the decoded html string;
    the explode multiplies rows before any shuffle, so the edge list is
    born partitioned like its source scan."""
    return webdocs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.regexp_extract_all(
                F.col("html").cast("string"), F.lit(_LINK_RE), F.lit(1)
            )
        ).alias("dst_s"),
    ).select("src", F.col("dst_s").cast("long").alias("dst"))


def link_degrees(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(node, out_deg, in_deg) for every node (0 where absent)."""
    outd = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ind = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        nodes.join(outd, "node", "left")
        .join(ind, "node", "left")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 5,
    damping_pct: int = 85,
    checkpoint_every: int = 2,
    dangling: str = "decay",
) -> DataFrame:
    """Integer-exact damped PageRank; returns (node, rank) in rank units.

    ``nodes`` must have a ``node`` column, ``edges`` (src, dst). The one
    driver-side scalar is the node count (control plane, same as DSIR's
    count pass).

    ``dangling='decay'`` (default): nodes with no out-edges keep their
    base share and emit nothing — their mass decays (the common
    simplification; the fixture graph has out-degree 3 everywhere, so no
    mass is dangling there). ``dangling='redistribute'``: the textbook
    definition — each iteration sums the rank held by zero-out-degree
    nodes (one extra O(nodes) aggregate producing ONE row, broadcast
    back) and credits every node ``dangling_mass div n`` before damping,
    still exact int64 arithmetic, so the DuckDB twin stays bit-identical."""
    if dangling not in ("decay", "redistribute"):
        raise ValueError(f"dangling must be decay|redistribute, got {dangling!r}")
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank over an empty node set")
    base = RANK_UNIT // n
    n_parts = int(nodes.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    outd = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # edges ⋈ out-degree never changes across iterations — MATERIALIZE it
    # once (lazy localCheckpoint: computed on first use, reused after),
    # HASH-PARTITIONED BY src with an explicit partition count so every
    # iteration's join reuses the stored partitioning instead of paying
    # an edge-table exchange per iteration (localCheckpoint preserves
    # outputPartitioning; the explicit count keeps AQE from coalescing
    # one side out of alignment). Without this, every iteration re-runs
    # the whole edge derivation — for extracted link graphs that is a
    # full html regexp pass per iteration — AND re-shuffles it. At
    # cluster scale the same role is played by snapshotting the edge
    # table (plans/snapshot.py) partitioned the same way.
    e = (
        edges.join(outd, "src")
        .select("src", "dst", "od")
        .repartition(n_parts, "src")
        .localCheckpoint(eager=False)
    )
    # nodes likewise: partitioned by node once, so the per-iteration
    # rank update join and the contrib aggregate stay co-partitioned
    nodes_p = nodes.select("node").repartition(n_parts, "node").localCheckpoint(
        eager=False
    )
    ranks = nodes_p.select("node", F.lit(base).cast("long").alias("rank"))
    if dangling == "redistribute":
        # the SET of zero-out-degree nodes never changes — compute it
        # once (their rank does change; summed per iteration below)
        danglers = (
            nodes_p.join(outd, nodes_p.node == outd.src, "left_anti")
            .localCheckpoint(eager=False)
        )
    keep_pct = 100 - damping_pct
    for it in range(n_iters):
        # ranks is partitioned by node (inherited from nodes_p through
        # the BHJ-free update join), e by src: co-partitioned equi-join,
        # zero exchange; the shuffle_hash hint skips re-sorting the edge
        # table every iteration (build side is the per-partition rank
        # slice — nodes/n_parts rows, bounded by the same sizing that
        # makes the partitioning valid)
        contrib = (
            e.join(ranks.hint("shuffle_hash"), e.src == ranks.node)
            .select(e.dst.alias("node"), F.expr("rank div od").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        summed = nodes_p.join(contrib, "node", "left").select(
            "node", F.coalesce("s", F.lit(0)).cast("long").alias("s")
        )
        if dangling == "redistribute":
            # one tiny aggregate: total rank on zero-out-degree nodes,
            # broadcast back as a 1-row frame (never collected)
            dang = ranks.join(danglers, "node", "left_semi").agg(
                F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dmass")
            )
            summed = summed.crossJoin(F.broadcast(dang)).select(
                "node",
                (F.col("s") + F.expr(f"dmass div {n}")).alias("s"),
            )
        ranks = summed.select(
            "node",
            (
                F.lit((keep_pct * base) // 100).cast("long")
                + F.expr(f"({damping_pct} * s) div 100")
            ).alias("rank"),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_sql(
    nodes_sql: str,
    edges_sql: str,
    n_iters: int = 5,
    damping_pct: int = 85,
    dangling: str = "decay",
) -> str:
    """The identical integer chain as DuckDB CTEs: r0..rN, one CTE per
    iteration. ``nodes_sql`` must yield column ``node``, ``edges_sql``
    (src, dst). Returns a complete WITH prefix ending in ``rN`` — append
    a SELECT over ``r{n_iters}``. ``dangling='redistribute'`` mirrors
    the operator's textbook mode: a d{i} CTE sums rank on
    zero-out-degree nodes and every node is credited ``dmass // n``
    before damping — same exact int64 steps."""
    keep_pct = 100 - damping_pct
    parts = [
        f"nodes AS ({nodes_sql})",
        f"edges AS ({edges_sql})",
        "outd AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src)",
        "ncnt AS (SELECT COUNT(*) AS n FROM nodes)",
        "nbase AS (SELECT CAST(1000000000000 // COUNT(*) AS BIGINT) AS base"
        " FROM nodes)",
        "r0 AS (SELECT node, (SELECT base FROM nbase) AS rank FROM nodes)",
    ]
    for i in range(1, n_iters + 1):
        if dangling == "redistribute":
            parts.append(
                f"""d{i} AS (
                SELECT CAST(COALESCE(SUM(rank), 0) AS BIGINT) AS dmass
                FROM r{i - 1}
                WHERE node NOT IN (SELECT src FROM outd)
            )"""
            )
            credit = f" + (SELECT dmass FROM d{i}) // (SELECT n FROM ncnt)"
        else:
            credit = ""
        parts.append(
            f"""r{i} AS (
            SELECT n.node,
                   CAST(({keep_pct} * (SELECT base FROM nbase)) // 100
                        + ({damping_pct} * (COALESCE(c.s, 0){credit})) // 100
                        AS BIGINT) AS rank
            FROM nodes n
            LEFT JOIN (
                SELECT e.dst AS node, SUM(r.rank // o.od) AS s
                FROM edges e
                JOIN r{i - 1} r ON e.src = r.node
                JOIN outd o ON e.src = o.src
                GROUP BY e.dst
            ) c ON n.node = c.node
        )"""
        )
    return "WITH " + ",\n".join(parts)
