"""Boilerplate removal — main-content extraction from HTML pages.

The classic web-pipeline stage between "fetch" and "clean": navigation
bars, sidebars, and footers are link-dense and word-sparse, the article
body is the opposite (the heuristic behind Boilerpipe's NumWordsRules
and trafilatura's density filters). This implementation is 100%
Catalyst — block splitting, tag stripping, word/link-word counting, and
the keep rule are all higher-order array expressions, so the whole
operator inlines into one WholeStageCodegen map stage: zero shuffles,
zero Python, and filters/projections around it still push down to the
scan. At 100 TB that matters more than heuristic finesse: boilerplate
removal touches EVERY page, so it must ride the ingest scan for free.

Keep rule (per block, after stripping inline tags):
``words >= min_words AND link_words <= words * max_link_density``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["block_features", "extract_main_content", "boilerplate_html"]

_BLOCK_TAGS = r"(?i)</?(?:div|p|body|html|nav|footer|header|section|article|ul|ol|li|table|tr|td)[^>]*>"


def _words(c: Column) -> Column:
    return F.size(F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != F.lit("")))


def block_features(html: Column) -> Column:
    """HTML string -> array<struct<txt, words, link_words>>: drop the
    <head>, split on block-level tags, and per block strip inline tags
    (-> visible text) and count total vs inside-<a> words."""
    body = F.regexp_replace(html, r"(?is)<head.*?</head>", "")
    blocks = F.split(body, _BLOCK_TAGS)

    def feat(b: Column) -> Column:
        clean = F.trim(F.regexp_replace(b, r"<[^>]+>", " "))
        link_txt = F.array_join(
            F.regexp_extract_all(b, F.lit(r"(?is)<a[^>]*>(.*?)</a>"), F.lit(1)),
            " ",
        )
        return F.struct(
            clean.alias("txt"),
            _words(clean).alias("words"),
            _words(link_txt).alias("link_words"),
        )

    return F.transform(blocks, feat)


def extract_main_content(
    html: Column,
    *,
    min_words: int = 10,
    max_link_density: float = 1.0 / 3.0,
) -> Column:
    """struct<n_kept int, main string>: content blocks that pass the
    density rule, joined with newlines in document order."""
    feats = block_features(html)
    kept = F.filter(
        feats,
        lambda s: (s["words"] >= F.lit(min_words))
        & (
            s["link_words"].cast("double")
            <= s["words"].cast("double") * F.lit(float(max_link_density))
        ),
    )
    return F.struct(
        F.size(kept).cast("int").alias("n_kept"),
        F.array_join(F.transform(kept, lambda s: s["txt"]), "\n").alias("main"),
    )


def boilerplate_html(doc_id: Column, text: Column, lang: Column) -> Column:
    """Deterministic fixture page: nav (link density 1.0), the article
    body (the document text), a sidebar of ad links, and a short
    link-bearing footer — so the ONLY block the keep rule admits is the
    body, and the expected output is formula-derivable (= trim(text))
    without re-running the parse: the oracle's independence check."""
    return F.concat(
        F.lit("<html><head><title>Doc "),
        doc_id.cast("string"),
        F.lit("</title></head><body>"),
        F.lit('<div class="nav"><a href="/">Home</a> '),
        F.lit('<a href="/about">About pages</a> <a href="/'),
        lang,
        F.lit('">Language index</a></div>'),
        F.lit('<div class="content"><p>'),
        text,
        F.lit("</p></div>"),
        F.lit('<div class="sidebar"><a href="/ad1">Buy one thing</a> '),
        F.lit('<a href="/ad2">Buy another thing</a></div>'),
        F.lit('<div class="footer"><a href="/tos">Terms</a> (c) 2025 example.org</div>'),
        F.lit("</body></html>"),
    )
