"""robots.txt (RFC 9309) parsing + distributed URL rule filtering.

A Common-Crawl-style pipeline filters captures against the politeness
rules the crawler saw; this module implements the core of RFC 9309:

* :func:`parse_robots_txt` — group-aware parser: groups are runs of
  ``User-agent`` lines followed by ``Allow``/``Disallow`` rules; the
  applicable group is the LONGEST user-agent token that prefixes our
  product token, else the ``*`` group; comments/unknown directives are
  skipped; an empty ``Disallow:`` means allow-all (it contributes no
  rule).
* :func:`rule_like_pattern` — RFC path patterns support ``*`` (any run)
  and a trailing ``$`` anchor; both translate exactly to SQL ``LIKE``
  (``%`` wildcard, absence of the trailing ``%`` as the anchor), so the
  match predicate runs identically in Spark SQL and DuckDB — that is
  what makes the ``robots_filter`` query oracle-checkable without a
  Python twin of the matcher.
* :func:`robots_verdicts` — the distributed filter: rules are a
  BROADCAST table (robots.txt corpora are O(hosts), tiny next to the
  captures); verdict = most-specific matching rule per url (longest
  pattern wins, tie → allow, no match → allow), computed with one
  broadcast join + one window over the few matching rules per url.

Specificity: RFC 9309 §2.2.2 orders rules by length of the path pattern
(octets); ties prefer allow. We use the pattern length EXCLUDING
wildcard/anchor characters so ``/p*`` doesn't outrank ``/p`` spuriously.

Scale shape: captures-side is never shuffled — the rules join is a
broadcast hash join and the per-url window partitions by url over ≤
(rules-per-host) rows, which AQE keeps map-side. The robots corpus
itself (one row per host) comes from the same WARC lane as everything
else at production scale.

Reference parity: none — the reference has no crawl surface; this is
north_rule (Common-Crawl pipeline) surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "parse_robots_txt",
    "rule_like_pattern",
    "rules_rows",
    "robots_verdicts",
]

DEFAULT_AGENT = "geokittenbot"


def parse_robots_txt(text: str, agent: str = DEFAULT_AGENT):
    """robots.txt text → list of (allow: bool, path_pattern: str) for the
    applicable group. RFC 9309 group selection: the group whose
    user-agent token is the longest prefix of ``agent`` (case-
    insensitive); ``*`` matches any agent with specificity 0; no group →
    no rules (everything allowed)."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agent_run = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if cur_agents and val:
                cur_rules.append((key == "allow", val))
        else:
            in_agent_run = False  # crawl-delay/sitemap/unknown: skipped
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    best_spec = -1
    best_rules: list[tuple[bool, str]] = []
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                spec = 0
            elif agent.startswith(a):
                spec = len(a)
            else:
                continue
            if spec > best_spec:
                best_spec = spec
                best_rules = rules
    return best_rules


def rule_like_pattern(path_pattern: str) -> tuple[str, int]:
    """RFC path pattern → (SQL LIKE pattern, specificity).

    ``*`` → ``%``; a trailing ``$`` anchors the match (encoded as the
    absence of the trailing ``%``). ``LIKE`` runs with no escape clause
    so the pattern means the same thing in Spark SQL and DuckDB; url
    paths containing literal ``%``/``_`` would need an ESCAPE variant
    (loudly rejected here rather than silently mis-matched).
    Specificity = count of literal (non-wildcard) characters, so
    ``/p*`` never outranks ``/p/q``."""
    anchored = path_pattern.endswith("$")
    body = path_pattern[:-1] if anchored else path_pattern
    if "%" in body or "_" in body:
        raise NotImplementedError(
            "robots path patterns containing literal %/_ need ESCAPE "
            "handling (not present in RFC-typical rules)"
        )
    like = body.replace("*", "%")
    if not anchored:
        like += "%"
    spec = sum(1 for c in body if c != "*")
    return like, spec


def rules_rows(host_robots, agent: str = DEFAULT_AGENT):
    """[(host, robots_txt)] → [(host, allow, like_pattern, spec)] rows."""
    rows = []
    for host, text in host_robots:
        for allow, pat in parse_robots_txt(text, agent):
            like, spec = rule_like_pattern(pat)
            rows.append((host, allow, like, spec))
    return rows


def robots_verdicts(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """urls(url, host, path) × rules(host, allow, like_pattern, spec) →
    (url, allowed). Most-specific match wins; ties prefer allow; no
    match → allowed. Rules broadcast; captures never shuffle."""
    r = rules.select(
        F.col("host").alias("_rhost"), "allow", "like_pattern", "spec"
    )
    # the match predicate lives IN the join condition: a url whose host
    # has rules but none matching must still survive as a null-extended
    # (→ allowed) row, not be filtered away
    matched = urls.join(
        F.broadcast(r),
        (urls["host"] == r["_rhost"])
        & F.expr("path LIKE like_pattern"),
        "left",
    )
    w = Window.partitionBy("url").orderBy(
        F.col("spec").desc_nulls_last(),
        F.col("allow").desc_nulls_last(),
    )
    return (
        matched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "url",
            F.coalesce(F.col("allow"), F.lit(True)).alias("allowed"),
        )
    )


def sitemap_directives(robots_df: DataFrame, *, text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> exploded (host, sitemap_url).

    ``Sitemap:`` lines are GROUP-INDEPENDENT (RFC 9309 / sitemaps.org
    autodiscovery): they apply to the whole file wherever they appear,
    so extraction ignores group structure entirely. Pure Catalyst
    (per-line comment strip + case-insensitive match inside one
    higher-order transform) — map-only, composes with the broadcast
    rules build in the same scan."""
    lines = F.split(F.col(text_col), "\n")
    urls = F.filter(
        F.transform(
            lines,
            lambda l: F.regexp_extract(
                F.trim(F.split(l, "#").getItem(0)), r"(?i)^sitemap:\s*(\S+)$", 1
            ),
        ),
        lambda u: u != F.lit(""),
    )
    return robots_df.select("host", F.explode(urls).alias("sitemap_url"))
