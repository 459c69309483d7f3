"""Bigram language-model perplexity scoring (CCNet-style quality filter).

The canonical LM-based quality gate for web-crawl training data (CCNet /
RedPajama / FineWeb pipelines): train a small n-gram LM per language,
score every document by perplexity, and keep the low-perplexity head.
The published pipelines use a KenLM 5-gram trained on Wikipedia; the
distributed re-expression here trains an add-alpha-smoothed **bigram**
LM per language over the corpus itself (no external data in this
sandbox) — the operator shape (two count aggregations, broadcast LM,
map-side scoring, per-doc fold) is exactly the 100-TB shape; swapping in
a bigger n or an external training corpus changes only the inputs.

Scale analysis:
* **Training** is two ``groupBy`` counts (unigrams, bigrams) with
  map-side partial aggregation — the classic word-count shuffle, keys
  are short strings pre-capped by the vocab step.
* **Vocabulary** and the **pruned bigram table** are top-K per language
  with deterministic (count desc, word asc) tie-break, computed in TWO
  salted phases (top-K per (lang, hash-salt), then top-K over the
  bounded survivors) so no single reducer ever sees a whole language's
  count table. Both outputs are bounded (vocab_size / max_bigrams rows
  per language) and hinted ``broadcast()`` for the scoring join, so
  scoring is a map-only stage: no shuffle touches the corpus again.
* **Scoring** forms adjacent bigrams MAP-SIDE from the per-doc token
  array (``transform`` over adjacent indices — no per-doc window, the
  corpus is never shuffled just to see its own neighbors), maps OOV
  words to ``<unk>`` via broadcast vocab joins, joins the broadcast
  unigram/bigram tables, and folds
  ``nll = -ln((c(w1,w2)+a) / (c(w1)+a*(V+1)))`` per document;
  ``ppl = exp(avg nll)``. The only corpus shuffle in the whole scoring
  path is the final per-doc aggregate (partial-agg combined map-side).
* **The token stage is factored out and shareable.**
  :func:`tokenize_stage` produces the (doc_id, grp, ws) frame every LM
  consumer reads; ``lm_train``/``lm_perplexity`` accept it pre-built via
  ``tokens=`` — at 100 TB you run it through ``plans/snapshot.py`` (one
  parquet snapshot, resumable, per-partition lineage) and train + score
  + every OTHER token consumer (BPE, DSIR, classifier) reads the
  snapshot instead of re-scanning text. ``materialize_tokens=True``
  persists it in-session instead; measured at sf0.1 (short synthetic
  docs) the persist is a net LOSS (~2.8s vs ~2.1s median: cache
  write/read costs more than re-running the cheap regex inside
  whole-stage codegen), so it defaults OFF — flip it when document text
  is big enough that tokenization dominates the scan.
* **Unigram counts are derived, not re-counted.** In-vocab unigram
  counts already exist in the vocab top-K pass; the ``<unk>`` bucket is
  (per-group total tokens) − (sum of in-vocab counts), and the total
  folds map-side from per-doc array sizes. That removes the third
  corpus-wide count shuffle the round-3 plan had (canonicalize + regroup
  every token), leaving exactly two: vocab words and bigrams. Measured
  ~22% off the leg at sf0.1.

Everything is Catalyst expressions — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import split_words

__all__ = ["tokenize_stage", "lm_train", "lm_perplexity", "lm_perplexity_sql"]

UNK = "<unk>"


def tokenize_stage(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """(doc_id, grp, ws array<string>): the tokenization scan, factored
    out so it runs ONCE per pipeline. Persist it (``lm_perplexity`` does
    by default) or snapshot it through ``plans/snapshot.py`` and feed it
    to ``lm_train``/``lm_perplexity`` via ``tokens=``."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        split_words(F.lower(F.trim(F.col(text_col)))).alias("ws"),
    )


def _tokens(tok: DataFrame) -> DataFrame:
    """(doc_id, grp, w): one row per token, from the token stage."""
    return tok.select("doc_id", "grp", F.explode("ws").alias("w"))


def _pairs(tok: DataFrame) -> DataFrame:
    """(doc_id, grp, w1, w2): one row per adjacent word pair, formed
    MAP-SIDE from the per-doc token array (``transform`` over adjacent
    indices) — no per-doc window, so the corpus is never shuffled just to
    see its neighbors."""
    ws = F.col("ws")
    pair_structs = F.filter(
        F.transform(
            ws,
            lambda w, i: F.struct(
                w.alias("w1"), F.get(ws, i + 1).alias("w2")
            ),
        ),
        lambda s: s["w2"].isNotNull(),
    )
    return tok.select(
        "doc_id", "grp", F.explode(pair_structs).alias("p")
    ).select("doc_id", "grp", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def _canon_pairs(pairs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Map both pair sides to their canonical token (OOV → <unk>) via two
    broadcast left joins against the vocab — map-only on the corpus."""
    v1 = F.broadcast(
        vocab.select(F.col("grp"), F.col("w").alias("w1"), F.lit(1).alias("__v1"))
    )
    v2 = F.broadcast(
        vocab.select(F.col("grp"), F.col("w").alias("w2"), F.lit(1).alias("__v2"))
    )
    return (
        pairs.join(v1, ["grp", "w1"], "left")
        .join(v2, ["grp", "w2"], "left")
        .select(
            "doc_id",
            "grp",
            F.when(F.col("__v1").isNotNull(), F.col("w1"))
            .otherwise(F.lit(UNK))
            .alias("cw1"),
            F.when(F.col("__v2").isNotNull(), F.col("w2"))
            .otherwise(F.lit(UNK))
            .alias("cw2"),
        )
    )


def _prune_topk(counts: DataFrame, order_by, k: int, salt_expr, n_salts: int = 64) -> DataFrame:
    """Exact per-group top-K without a single-reducer-per-group window.

    A plain ``row_number() over (partition by grp)`` sends EVERY count row
    for a language through one reducer — with a handful of languages over
    a web corpus that is a billions-of-rows single partition. Phase 1
    takes top-K within (grp, salt) — any global top-K row is necessarily
    in its own salt bucket's top-K — phase 2 re-ranks the ≤ n_salts*K
    survivors per group, which is bounded regardless of corpus size.
    Both phases use the same deterministic ordering, so the result is
    identical to the single-window form."""
    local = Window.partitionBy("grp", "__salt").orderBy(*order_by)
    glob = Window.partitionBy("grp").orderBy(*order_by)
    return (
        counts.withColumn("__salt", salt_expr)
        .withColumn("__rn", F.row_number().over(local))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .withColumn("__rn", F.row_number().over(glob))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )


def lm_train(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    vocab_size: int = 1024,
    max_bigrams: int = 65536,
    tokens: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the per-group bigram LM; returns (vocab, unigrams, bigrams).

    vocab:    (grp, w)                  — top ``vocab_size`` per group by
                                          (count desc, w asc)
    unigrams: (grp, cw, cnt, vsize)     — canonicalized (OOV → <unk>)
                                          counts + the group's vocab size
    bigrams:  (grp, cw1, cw2, cnt)      — canonicalized adjacent-pair
                                          counts, pruned to ``max_bigrams``
                                          per group by (count desc, keys)

    ``tokens`` (a :func:`tokenize_stage` frame, typically persisted or
    snapshot-backed) skips re-tokenizing ``docs``.
    """
    tok = tokens if tokens is not None else tokenize_stage(
        docs, id_col=id_col, text_col=text_col, group_col=group_col
    )
    toks = _tokens(tok)

    word_counts = toks.groupBy("grp", "w").agg(F.count(F.lit(1)).alias("cnt"))
    vocab_c = _prune_topk(
        word_counts,
        [F.desc("cnt"), F.asc("w")],
        vocab_size,
        F.pmod(F.xxhash64("w"), F.lit(64)),
    )
    vocab = vocab_c.select("grp", "w")

    # Canonicalized unigram counts WITHOUT re-counting the corpus: every
    # in-vocab word keeps its count from the vocab top-K pass, and the
    # <unk> bucket is (total tokens) − (sum of in-vocab counts). The
    # per-group total is the SUM of the word-count table the vocab pass
    # already built (identical subtree — the exchange is reused, so no
    # second corpus pass; the r3-r5 form re-folded per-doc array sizes
    # over the token stage, one extra corpus-wide aggregate per run).
    # A group whose docs have zero tokens has no word_counts row and no
    # vocab either, so the downstream inner join drops it in both forms.
    totals = word_counts.groupBy("grp").agg(
        F.sum("cnt").cast("long").alias("tot")
    )
    invocab_stats = vocab_c.groupBy("grp").agg(
        F.count(F.lit(1)).alias("vsize"), F.sum("cnt").alias("in_cnt")
    )
    unk_rows = (
        totals.join(invocab_stats, "grp")
        .select(
            "grp",
            F.lit(UNK).alias("cw"),
            (F.col("tot") - F.col("in_cnt")).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    unigrams = (
        vocab_c.select("grp", F.col("w").alias("cw"), "cnt")
        .unionByName(unk_rows)
        .join(F.broadcast(invocab_stats.select("grp", "vsize")), "grp")
    )

    cpairs = _canon_pairs(_pairs(tok), vocab)
    bigrams = _prune_topk(
        cpairs.groupBy("grp", "cw1", "cw2").agg(F.count(F.lit(1)).alias("cnt")),
        [F.desc("cnt"), F.asc("cw1"), F.asc("cw2")],
        max_bigrams,
        F.pmod(F.xxhash64("cw1", "cw2"), F.lit(64)),
    ).select("grp", "cw1", "cw2", "cnt")
    return vocab, unigrams, bigrams


def lm_perplexity(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    vocab_size: int = 1024,
    max_bigrams: int = 65536,
    alpha: float = 0.1,
    tokens: DataFrame | None = None,
    materialize_tokens: bool = False,
) -> DataFrame:
    """Per-document bigram perplexity under the per-group add-alpha LM.

    Returns (doc_id, grp, n_bigrams, avg_nll, ppl) for every document
    with at least one adjacent word pair. Deterministic: vocabulary and
    bigram pruning tie-break lexicographically; the smoothing denominator
    uses the group's ACTUAL vocab size + 1 (the <unk> bucket).

    The token stage feeds three consumers (vocab/total counts, bigram
    counts, scoring). Pass a snapshot-backed ``tokens=`` frame to share
    the stage with other token consumers and make this leg resumable;
    ``materialize_tokens=True`` persists it in-session instead (off by
    default — see the module docstring for the sf0.1 measurement)."""
    tok = tokens if tokens is not None else tokenize_stage(
        docs, id_col=id_col, text_col=text_col, group_col=group_col
    )
    if materialize_tokens and tokens is None:
        tok = tok.persist()
    vocab, unigrams, bigrams = lm_train(
        docs,
        id_col=id_col,
        text_col=text_col,
        group_col=group_col,
        vocab_size=vocab_size,
        max_bigrams=max_bigrams,
        tokens=tok,
    )
    pairs = _canon_pairs(_pairs(tok), vocab)
    bg = bigrams.select(
        F.col("grp").alias("bgrp"),
        F.col("cw1").alias("bw1"),
        F.col("cw2").alias("bw2"),
        F.col("cnt").alias("cb"),
    )
    scored = (
        pairs.join(
            F.broadcast(bg),
            (F.col("grp") == F.col("bgrp"))
            & (F.col("cw1") == F.col("bw1"))
            & (F.col("cw2") == F.col("bw2")),
            "left",
        )
        .drop("bgrp", "bw1", "bw2")
        .join(
            F.broadcast(
                unigrams.select(
                    "grp", F.col("cw").alias("cw1"), F.col("cnt").alias("cu"), "vsize"
                )
            ),
            ["grp", "cw1"],
        )
    )
    nll = -F.log(
        (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(alpha))
        / (F.col("cu") + F.lit(alpha) * (F.col("vsize") + F.lit(1)))
    )
    return scored.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg(nll).alias("avg_nll"),
        F.exp(F.avg(nll)).alias("ppl"),
    )


def lm_perplexity_sql(
    *,
    group_col: str = "lang",
    vocab_size: int = 1024,
    max_bigrams: int = 65536,
    alpha: float = 0.1,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`lm_perplexity` over ``documents`` — the same
    tokenize → vocab top-K → canonicalize → count → smooth → fold chain
    in ANSI SQL (rounded like the Spark query entry)."""
    return f"""
        WITH toks AS (
            SELECT doc_id, grp, u.pos - 1 AS pos, u.w
            FROM (
                SELECT doc_id, {group_col} AS grp,
                       unnest(list_transform(
                           list_filter(string_split(lower(trim(text)), ' '),
                                       x -> x <> ''),
                           (w, i) -> {{'w': w, 'pos': i}})) AS u
                FROM documents
            )
        ),
        vocab AS (
            SELECT grp, w FROM (
                SELECT grp, w, COUNT(*) AS cnt,
                       ROW_NUMBER() OVER (PARTITION BY grp
                                          ORDER BY COUNT(*) DESC, w ASC) AS rn
                FROM toks GROUP BY grp, w
            ) WHERE rn <= {vocab_size}
        ),
        canon AS (
            SELECT t.doc_id, t.grp, t.pos,
                   CASE WHEN v.w IS NOT NULL THEN t.w ELSE '{UNK}' END AS cw
            FROM toks t LEFT JOIN vocab v ON t.grp = v.grp AND t.w = v.w
        ),
        vsizes AS (SELECT grp, COUNT(*) AS vsize FROM vocab GROUP BY grp),
        unigrams AS (
            SELECT c.grp, c.cw, COUNT(*) AS cnt, ANY_VALUE(s.vsize) AS vsize
            FROM canon c JOIN vsizes s ON c.grp = s.grp
            GROUP BY c.grp, c.cw
        ),
        pairs AS (
            SELECT doc_id, grp, cw,
                   LAG(cw) OVER (PARTITION BY doc_id ORDER BY pos) AS cw1
            FROM canon
        ),
        bigrams AS (
            SELECT grp, cw1, cw2, cnt FROM (
                SELECT grp, cw1, cw AS cw2, COUNT(*) AS cnt,
                       ROW_NUMBER() OVER (PARTITION BY grp
                                          ORDER BY COUNT(*) DESC,
                                                   cw1 ASC, cw ASC) AS rn
                FROM pairs WHERE cw1 IS NOT NULL GROUP BY grp, cw1, cw
            ) WHERE rn <= {max_bigrams}
        )
        SELECT p.doc_id,
               p.grp AS lang,
               COUNT(*) AS n_bigrams,
               ROUND(AVG(-ln((COALESCE(b.cnt, 0) + {alpha}) /
                             (u.cnt + {alpha} * (u.vsize + 1)))),
                     {round_to}) AS avg_nll,
               ROUND(exp(AVG(-ln((COALESCE(b.cnt, 0) + {alpha}) /
                                 (u.cnt + {alpha} * (u.vsize + 1))))),
                     {round_to}) AS ppl
        FROM pairs p
        LEFT JOIN bigrams b
               ON p.grp = b.grp AND p.cw1 = b.cw1 AND p.cw = b.cw2
        JOIN unigrams u ON p.grp = u.grp AND p.cw1 = u.cw
        WHERE p.cw1 IS NOT NULL
        GROUP BY p.doc_id, p.grp
    """
