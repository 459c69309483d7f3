"""Web-text functions: extraction, language-ID, quality, tokens, fingerprint.

The training-data-pipeline function set over the `documents` table. Every
function here has two faces kept in lockstep:

* a Spark ``Column`` builder (pure ``pyspark.sql.functions`` — JVM-side,
  whole-stage-codegen; the one pandas UDF is ``extract_text`` which needs
  real HTML parsing);
* an ANSI-SQL string builder for the DuckDB oracle
  (``__spark_entry__.oracle_sql``).

The extract invariant (BASELINE.json input_hint): for fixture pages built as
``<html><head><title>T</title></head><body><p>B</p></body></html>`` wrapping
``text = "T\\nB"``, ``extract_text(html)`` must equal ``text`` byte-for-byte.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

__all__ = [
    "extract_text",
    "normalize_nfc",
    "normalize_nfc_sql",
    "lang_markers",
    "lang_id_col",
    "lang_id_sql",
    "token_count_ws",
    "token_count_ws_sql",
    "token_count_bpeish",
    "token_count_bpeish_sql",
    "quality_cols",
    "quality_sql",
    "fingerprint_col",
    "fingerprint_sql",
    "rolling_fingerprint_col",
    "rolling_fingerprint_sql",
    "redact_pii_col",
    "redact_pii_sql",
]


# ---------------------------------------------------------------------------
# HTML → text extraction (vectorized pandas UDF; the one Python hot path)
# ---------------------------------------------------------------------------

_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title>", re.S | re.I)
_BODY_RE = re.compile(rb"<body[^>]*>(.*?)</body>", re.S | re.I)
_TAG_RE = re.compile(rb"<[^>]+>")
_SCRIPT_RE = re.compile(rb"<(script|style)[^>]*>.*?</\1>", re.S | re.I)


def _extract_one(html: bytes) -> str:
    """Deterministic extraction: title line + newline + tag-stripped body.

    Inverts the fixture template byte-exactly; on arbitrary HTML it is a
    best-effort deterministic tag-strip (no network, no entity expansion
    beyond the 5 XML builtins)."""
    if html is None:
        return None
    if isinstance(html, str):
        html = html.encode("utf-8")
    html = _SCRIPT_RE.sub(b"", html)
    tm = _TITLE_RE.search(html)
    title = tm.group(1) if tm else b""
    bm = _BODY_RE.search(html)
    body_html = bm.group(1) if bm else (b"" if tm else html)
    body = _TAG_RE.sub(b"", body_html).strip()
    for ent, ch in ((b"&lt;", b"<"), (b"&gt;", b">"), (b"&quot;", b'"'),
                    (b"&apos;", b"'"), (b"&amp;", b"&")):
        body = body.replace(ent, ch)
        title = title.replace(ent, ch)
    if title:
        return (title + b"\n" + body).decode("utf-8", errors="replace")
    return body.decode("utf-8", errors="replace")


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """F11 (SURVEY §2.3): html BINARY → extracted text, Arrow-batched."""
    return html.map(_extract_one)


@pandas_udf(StringType())
def normalize_nfc(text: pd.Series) -> pd.Series:
    """Unicode NFC normalization (UAX #15), Arrow-batched.

    The standard pre-hash step for web text: the same word crawled as
    precomposed ``é`` and as ``e`` + U+0301 must fingerprint identically
    or every dedup/contamination operator under-counts. DuckDB's
    ``nfc_normalize`` implements the same algorithm, which is what makes
    the ``unicode_normalize`` query oracle-checkable."""
    import unicodedata

    return text.map(
        lambda s: None if s is None else unicodedata.normalize("NFC", s)
    )


def normalize_nfc_sql(text_expr: str) -> str:
    return f"nfc_normalize({text_expr})"


# ---------------------------------------------------------------------------
# Language ID (marker-word n-gram heuristic — SQL-expressible)
# ---------------------------------------------------------------------------

# one high-frequency marker per language; counted as substring occurrences
# in the space-padded text (deterministic, same in both engines)
lang_markers = [
    ("en", " the "),
    ("es", " el "),
    ("de", " der "),
    ("fr", " le "),
    ("pt", " uma "),
]


def _occurrences(padded: Column, marker: str) -> Column:
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("long")


def lang_id_col(text: Column) -> Column:
    """Predicted language: argmax marker count, first-listed wins ties,
    'und' when all counts are zero."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    counts = [(lang, _occurrences(padded, m)) for lang, m in lang_markers]
    best = None
    for lang, c in counts:
        cond = F.lit(True)
        for lang2, c2 in counts:
            if lang2 == lang:
                continue
            # earlier-listed language wins ties
            earlier = [l for l, _ in lang_markers].index(lang2) < [l for l, _ in lang_markers].index(lang)
            cond = cond & (c > c2 if earlier else c >= c2)
        clause = F.when((c > 0) & cond, F.lit(lang))
        best = clause if best is None else best.when((c > 0) & cond, F.lit(lang))
    return best.otherwise(F.lit("und"))


def lang_id_sql(text_expr: str) -> str:
    padded = f"(' ' || {text_expr} || ' ')"
    cnt = {
        lang: f"CAST((length({padded}) - length(replace({padded}, '{m}', ''))) / {len(m)} AS BIGINT)"
        for lang, m in lang_markers
    }
    langs = [l for l, _ in lang_markers]
    whens = []
    for idx, lang in enumerate(langs):
        conds = [f"{cnt[lang]} > 0"]
        for idx2, lang2 in enumerate(langs):
            if idx2 == idx:
                continue
            op = ">" if idx2 < idx else ">="
            conds.append(f"{cnt[lang]} {op} {cnt[lang2]}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

def token_count_ws(text: Column) -> Column:
    """Whitespace token count (single-space-separated corpus semantics)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.length(trimmed) - F.length(F.replace(trimmed, F.lit(" "), F.lit(""))) + 1
    ).cast("long")


def token_count_ws_sql(text_expr: str) -> str:
    t = f"trim({text_expr})"
    return (
        f"CAST(CASE WHEN length({t}) = 0 THEN 0 "
        f"ELSE length({t}) - length(replace({t}, ' ', '')) + 1 END AS BIGINT)"
    )


_BPEISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_count_bpeish(text: Column) -> Column:
    """BPE-ish regex token count: letter runs, digit runs, single symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPEISH_PATTERN), 0)).cast("long")


def token_count_bpeish_sql(text_expr: str) -> str:
    return f"CAST(length(regexp_extract_all({text_expr}, '{_BPEISH_PATTERN}')) AS BIGINT)"


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

def quality_cols(text: Column) -> dict:
    """Length / punctuation / stopword-ratio quality signals (all JVM-side).

    Returns dict of named Columns; ``quality_score`` is a deterministic
    0-1 composite."""
    n_chars = F.length(text).cast("long")
    n_tokens = token_count_ws(text)
    avg_word_len = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    n_punct = (
        F.length(text) - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    ).cast("long")
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    n_stop = sum(_occurrences(padded, f" {w} ") for w in ["the", "a", "and", "of", "to"])
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 10.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 20.0, F.lit(1.0))) * 0.3
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_word_len": F.round(avg_word_len, 4),
        "punct_ratio": F.round(punct_ratio, 6),
        "stop_ratio": F.round(stop_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def quality_sql(text_expr: str) -> dict:
    t = text_expr
    n_chars = f"CAST(length({t}) AS BIGINT)"
    n_tokens = token_count_ws_sql(t)
    padded = f"(' ' || {t} || ' ')"
    stop_terms = " + ".join(
        f"CAST((length({padded}) - length(replace({padded}, ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
        for w in ["the", "a", "and", "of", "to"]
    )
    n_punct = f"CAST(length({t}) - length(regexp_replace({t}, '[\\.,;:!\\?]', '', 'g')) AS BIGINT)"
    avg_word_len = f"CASE WHEN {n_tokens} > 0 THEN CAST({n_chars} AS DOUBLE) / {n_tokens} ELSE 0.0 END"
    punct_ratio = f"CASE WHEN {n_chars} > 0 THEN CAST({n_punct} AS DOUBLE) / {n_chars} ELSE 0.0 END"
    stop_ratio = f"CASE WHEN {n_tokens} > 0 THEN CAST(({stop_terms}) AS DOUBLE) / {n_tokens} ELSE 0.0 END"
    score = (
        f"(LEAST(CAST({n_tokens} AS DOUBLE) / 100.0, 1.0) * 0.4"
        f" + LEAST(({stop_ratio}) * 10.0, 1.0) * 0.3"
        f" + (1.0 - LEAST(({punct_ratio}) * 20.0, 1.0)) * 0.3)"
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_word_len": f"round({avg_word_len}, 4)",
        "punct_ratio": f"round({punct_ratio}, 6)",
        "stop_ratio": f"round({stop_ratio}, 6)",
        "quality_score": f"round({score}, 6)",
    }


# ---------------------------------------------------------------------------
# Document fingerprint
# ---------------------------------------------------------------------------

def fingerprint_col(text: Column) -> Column:
    """Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed
    text (the exact-dedup key; SQL-identical in DuckDB)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def fingerprint_sql(text_expr: str) -> str:
    return f"md5(regexp_replace(lower(trim({text_expr})), '\\s+', ' ', 'g'))"


# Winnowing-style rolling-hash fingerprint: the minimum polynomial hash
# over all k-char windows of the canonical text. Position-robust (a doc
# keeps its fingerprint under appends/prepends unless the global-min
# window itself changes), engine-portable (pure integer arithmetic), and
# pure-Catalyst on the Spark side. Base 131, Mersenne-prime modulus: with
# k=8 the pre-mod window sum is < 2^61, so no intermediate overflow in
# either engine.
_ROLL_BASE = 131
_ROLL_MOD = 2147483647  # 2^31 - 1


def rolling_fingerprint_col(text: Column, k: int = 8) -> Column:
    t = F.rpad(F.lower(F.trim(text)), k, " ")  # pads ONLY sub-k docs
    n_windows = F.length(t) - (k - 1)
    win = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: sum(
            F.ascii(F.substring(t, (i + j).cast("int"), 1)).cast("long")
            * (_ROLL_BASE ** (k - 1 - j))
            for j in range(k)
        ) % _ROLL_MOD,
    )
    return F.array_min(win)


def rolling_fingerprint_sql(text_expr: str, k: int = 8) -> str:
    t = f"rpad(lower(trim({text_expr})), {k}, ' ')"
    terms = " + ".join(
        f"ord(substr({t}, i + {j}, 1)) * {_ROLL_BASE ** (k - 1 - j)}::BIGINT"
        for j in range(k)
    )
    return (
        f"list_min(list_transform(generate_series(1, length({t}) - {k - 1}), "
        f"i -> ({terms}) % {_ROLL_MOD}))"
    )


# ---------------------------------------------------------------------------
# PII redaction (training-data cleaning)
# ---------------------------------------------------------------------------

# Patterns stay inside the Java-regex ∩ RE2 common subset (no lookaround,
# no \b) so the Spark codegen path and the DuckDB oracle replace the exact
# same spans. Applied in a fixed order — email first (it contains digits an
# IP/phone pattern could nibble), then IPv4, then phone — identically in
# both engines, so overlapping matches resolve the same way.
_PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    (r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
]


def redact_pii_col(text: Column) -> Column:
    """Replace emails / IPv4 addresses / phone numbers with typed tokens.

    Pure-Catalyst ``regexp_replace`` chain: stays in whole-stage codegen,
    no Python in the hot path — at 10^12 rows this is a map-only stage
    with zero shuffle. Generalizes the reference's column-standardization
    surface (gdf_standardization.py transforms per-row values; here the
    transform is a vectorized JVM expression)."""
    out = text
    for pat, repl in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii_sql(text_expr: str) -> str:
    out = text_expr
    for pat, repl in _PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filtering)
# ---------------------------------------------------------------------------
# Per-document repetition measures used by web-corpus quality filters
# (Gopher / RefinedWeb style): type-token ratio, top-unigram and
# top-bigram mass, and the longest consecutive same-word run. All four
# are PURE ARRAY EXPRESSIONS on the Spark side — the word array never
# leaves the row, so at 10^12 documents this is a map-only stage with
# zero shuffle (the per-corpus rollup is the only exchange).
#
# Spark computes max n-gram multiplicity as a linear fold over the
# SORTED gram array (longest equal-adjacent run == max multiplicity);
# the DuckDB oracle computes the same number via unnest + GROUP BY.
# Generalizes the reference's per-row standardization surface
# (gdf_standardization.py) into columnar quality transforms.

def split_words(text: Column) -> Column:
    """Non-empty tokens of a single-space-separated document."""
    return F.filter(F.split(text, " "), lambda x: x != F.lit(""))


def split_words_sql(text_expr: str) -> str:
    return f"list_filter(string_split({text_expr}, ' '), x -> x <> '')"


def longest_equal_run(arr: Column) -> Column:
    """Longest run of equal adjacent elements — linear ``aggregate`` fold,
    no explode, no shuffle. 0 for an empty array. Applied to a sorted
    array this yields the max element multiplicity."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = (
            F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(arr, zero, step, lambda acc: acc["best"])


def word_bigrams(words: Column) -> Column:
    """Adjacent word pairs as 'w1 w2' strings (array expression)."""
    grams = F.transform(
        words,
        lambda w, i: F.when(
            i < F.size(words) - 1, F.concat(w, F.lit(" "), F.get(words, i + 1))
        ),
    )
    return F.filter(grams, lambda x: x.isNotNull())


def word_bigrams_sql(words_expr: str) -> str:
    w = words_expr
    return (
        f"list_filter(list_transform({w}, (w, i) -> "
        f"CASE WHEN i < len({w}) THEN w || ' ' || ({w})[i+1] END), x -> x IS NOT NULL)"
    )


# Flag thresholds tuned on the synthetic web corpus so the flag set is a
# proper minority (Gopher uses 0.2/0.18-style cutoffs on real crawl data).
REP_TOP_UNIGRAM_MAX = 0.14
REP_TTR_MIN = 0.32
REP_MAX_RUN = 3
# Gopher-style ratio filters only apply above a word-count floor: a
# 1-word doc has top_unigram/n_words == ttr == 1.0 and would always flag.
REP_MIN_WORDS = 20


def _rep_signals_udf():
    """Arrow-batched per-doc repetition counters.

    The pure-Catalyst form (two ``array_sort`` + three interpreted
    ``aggregate`` folds per doc) measured ~8 s over a 1.5 MB corpus — HOF
    lambdas never reach whole-stage codegen. Every output is an exact
    integer (multiplicities, lengths, run lengths), so the Python
    computation is bit-identical by construction: ``split(text, ' ')`` on a
    literal space == ``str.split(' ')``, max unigram multiplicity ==
    longest equal run of the sorted array, adjacent-pair tuples can't
    alias since words contain no spaces."""
    from collections import Counter

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "n_words long, n_distinct long, top_unigram long, top_bigram long,"
        " n_bigrams long, max_run long"
    )
    def rep_signals(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            if t is None:
                rows.append((None,) * 6)
                continue
            ws = [w for w in t.split(" ") if w != ""]
            n = len(ws)
            if n == 0:
                rows.append((0, 0, 0, 0, 0, 0))
                continue
            cnt = Counter(ws)
            if n >= 2:
                bg = Counter(zip(ws, ws[1:]))
                top_big, n_big = max(bg.values()), n - 1
            else:
                top_big, n_big = 0, 0
            best = run = 1
            for i in range(1, n):
                run = run + 1 if ws[i] == ws[i - 1] else 1
                if run > best:
                    best = run
            rows.append((n, len(cnt), max(cnt.values()), top_big, n_big, best))
        return pd.DataFrame(
            rows,
            columns=[
                "n_words", "n_distinct", "top_unigram",
                "top_bigram", "n_bigrams", "max_run",
            ],
        )

    return rep_signals


def repetition_cols(text: Column) -> dict:
    """Per-doc repetition signals as named Columns.

    Keys: ``n_words``, ``n_distinct``, ``top_unigram``, ``top_bigram``,
    ``n_bigrams``, ``max_run``, ``rep_flagged``. The integer counters come
    from one Arrow-batched pandas UDF (see :func:`_rep_signals_udf` for the
    exactness argument); the float threshold flag stays in Catalyst so its
    arithmetic is the oracle-pinned double division it always was."""
    s = _rep_signals_udf()(text)
    n = s["n_words"]
    n_distinct = s["n_distinct"]
    top_uni = s["top_unigram"]
    max_run = s["max_run"]
    flagged = (n >= REP_MIN_WORDS) & (
        (top_uni.cast("double") / n > REP_TOP_UNIGRAM_MAX)
        | (n_distinct.cast("double") / n < REP_TTR_MIN)
        | (max_run >= REP_MAX_RUN)
    )
    return {
        "n_words": n,
        "n_distinct": n_distinct,
        "top_unigram": top_uni,
        "top_bigram": s["top_bigram"],
        "n_bigrams": s["n_bigrams"],
        "max_run": max_run,
        "rep_flagged": flagged,
    }


def repetition_percell_sql() -> str:
    """DuckDB twin: per-doc repetition signals over ``documents`` as a CTE
    chain (same numbers as :func:`repetition_cols`). Yields a relation
    ``(doc_id, lang, n_words, n_distinct, top_unigram, top_bigram,
    n_bigrams, max_run, rep_flagged)``."""
    ws = split_words_sql("text")
    return f"""
        WITH w0 AS (
            SELECT doc_id, lang, {ws} AS ws FROM documents
        ), w1 AS (
            SELECT doc_id, lang, ws, {word_bigrams_sql('ws')} AS bg FROM w0
        ), uni AS (
            SELECT doc_id, MAX(c) AS top_unigram FROM (
                SELECT doc_id, w, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(ws) AS w FROM w1) GROUP BY 1, 2
            ) GROUP BY 1
        ), big AS (
            SELECT doc_id, MAX(c) AS top_bigram FROM (
                SELECT doc_id, g, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(bg) AS g FROM w1) GROUP BY 1, 2
            ) GROUP BY 1
        ), runs AS (
            SELECT doc_id, lang, len(ws) AS n_words, len(bg) AS n_bigrams,
                   len(list_distinct(ws)) AS n_distinct,
                   list_concat(
                       list_filter(list_transform(ws, (w, i) ->
                           CASE WHEN i = 1 OR ws[i-1] <> w THEN i END),
                           x -> x IS NOT NULL),
                       [len(ws) + 1]) AS starts
            FROM w1
        ), perdoc AS (
            SELECT r.doc_id, r.lang,
                   CAST(r.n_words AS BIGINT) AS n_words,
                   CAST(r.n_distinct AS BIGINT) AS n_distinct,
                   CAST(COALESCE(u.top_unigram, 0) AS BIGINT) AS top_unigram,
                   CAST(COALESCE(b.top_bigram, 0) AS BIGINT) AS top_bigram,
                   CAST(r.n_bigrams AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(list_max(list_transform(r.starts, (s, j) ->
                       CASE WHEN j < len(r.starts) THEN r.starts[j+1] - s END)), 0)
                       AS BIGINT) AS max_run
            FROM runs r
            LEFT JOIN uni u ON r.doc_id = u.doc_id
            LEFT JOIN big b ON r.doc_id = b.doc_id
        )
        SELECT *,
               (n_words >= {REP_MIN_WORDS} AND (
                    CAST(top_unigram AS DOUBLE) / n_words > {REP_TOP_UNIGRAM_MAX}
                    OR CAST(n_distinct AS DOUBLE) / n_words < {REP_TTR_MIN}
                    OR max_run >= {REP_MAX_RUN})) AS rep_flagged
        FROM perdoc
    """


# ---------------------------------------------------------------------------
# C4-style line/document cleaning (published C4 heuristics, Raffel et al.
# 2020: keep lines that end in terminal punctuation, have >= 5 words and
# don't mention javascript; keep documents with >= 3 surviving lines, no
# '{' and no 'lorem ipsum'). Pure Catalyst array/regex expressions —
# map-only, SQL-expressible (DuckDB twin below shares the constants).
# ---------------------------------------------------------------------------

C4_MIN_WORDS_PER_LINE = 5
C4_MIN_LINES = 3


def c4_clean_cols(text: Column) -> dict:
    """cleaned_text / n_lines_kept / doc_kept per the C4 rules."""
    lines = F.split(text, "\n")

    def _keep(line):
        t = F.trim(line)
        return (
            t.rlike('[.!?"]$')
            & (F.size(F.split(t, " +")) >= C4_MIN_WORDS_PER_LINE)
            & ~F.lower(t).contains("javascript")
        )

    kept = F.filter(lines, _keep)
    return {
        "cleaned_text": F.array_join(kept, "\n"),
        "n_lines_kept": F.size(kept).cast("long"),
        "doc_kept": (
            (F.size(kept) >= C4_MIN_LINES)
            & ~F.lower(text).contains("lorem ipsum")
            & ~text.contains("{")
        ),
    }


def c4_clean_sql(text_expr: str) -> dict:
    """DuckDB twin of c4_clean_cols (same constants, same regexes)."""
    keep = (
        "regexp_matches(trim(x), '[.!?\"]$') AND "
        f"len(string_split_regex(trim(x), ' +')) >= {C4_MIN_WORDS_PER_LINE} "
        "AND NOT contains(lower(trim(x)), 'javascript')"
    )
    kept = f"list_filter(string_split({text_expr}, chr(10)), x -> {keep})"
    return {
        "cleaned_text": f"array_to_string({kept}, chr(10))",
        "n_lines_kept": f"CAST(len({kept}) AS BIGINT)",
        "doc_kept": (
            f"(len({kept}) >= {C4_MIN_LINES} "
            f"AND NOT contains(lower({text_expr}), 'lorem ipsum') "
            f"AND NOT contains({text_expr}, '{{'))"
        ),
    }


def compression_signal_cols(text: Column) -> dict:
    """Deflate-compressibility quality signal (the Gopher/RefinedWeb
    heuristic: machine-generated or highly repetitive text compresses
    far better than natural prose). One Arrow-batched pandas UDF
    (zlib level 6 — a frozen, fully deterministic DEFLATE encoder),
    map-only; the emitted signal is exact integer math:
    ``comp_permille = comp_len * 1000 // raw_len``.

    Returns dict of named Columns: raw_len, comp_len, comp_permille."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _comp_len(col: pd.Series) -> pd.Series:
        import zlib

        return col.map(
            lambda s: len(zlib.compress(s.encode("utf-8"), 6))
            if s is not None
            else None
        ).astype("Int64")

    raw_len = F.octet_length(text).cast("long")  # zlib sees UTF-8 BYTES
    comp_len = _comp_len(text)
    permille = F.when(
        raw_len > 0, (comp_len * 1000 - F.pmod(comp_len * 1000, raw_len)) / raw_len
    ).otherwise(F.lit(None)).cast("long")
    return {
        "raw_len": raw_len,
        "comp_len": comp_len,
        "comp_permille": permille,
    }
