"""robots.txt parsing + URL rule filtering (functions/robots.py)."""

import pytest
from pyspark.sql import functions as F

from geokitten_spark.functions.robots import (
    parse_robots_txt,
    robots_verdicts,
    rule_like_pattern,
    rules_rows,
)

ROBOTS = """
# comment line
User-agent: alphabot
Disallow: /alpha

User-agent: geo
User-agent: other
Disallow: /geo-group

User-agent: geokittenbot
Disallow: /private
Allow: /private/ok
Crawl-delay: 10
Disallow: /tmp*.bak$

User-agent: *
Disallow: /
"""


def test_group_selection_longest_ua_prefix_wins():
    # 'geokittenbot' matches both 'geo' (3) and 'geokittenbot' (13):
    # the longest prefix group applies, and ONLY that group
    rules = parse_robots_txt(ROBOTS, agent="geokittenbot")
    assert rules == [
        (False, "/private"),
        (True, "/private/ok"),
        (False, "/tmp*.bak$"),
    ]
    # unknown agent falls back to the * group
    assert parse_robots_txt(ROBOTS, agent="randombot") == [(False, "/")]
    # 'geoagent' matches only the 'geo' prefix group
    assert parse_robots_txt(ROBOTS, agent="geoagent") == [
        (False, "/geo-group")
    ]


def test_empty_disallow_and_no_groups():
    assert parse_robots_txt("User-agent: *\nDisallow:\n") == []
    assert parse_robots_txt("just some text\n") == []


def test_rule_like_pattern_translation():
    assert rule_like_pattern("/a") == ("/a%", 2)
    assert rule_like_pattern("/a$") == ("/a", 2)
    assert rule_like_pattern("/tmp*.bak$") == ("/tmp%.bak", 8)
    # the trailing unanchored % after a wildcard is redundant but harmless
    assert rule_like_pattern("/x*y*") == ("/x%y%%", 3)
    with pytest.raises(NotImplementedError):
        rule_like_pattern("/literal%pct")


def test_verdicts_most_specific_ties_and_fallthrough(spark):
    rules = spark.createDataFrame(
        rules_rows([("h1", "User-agent: *\nDisallow: /d\nAllow: /d/keep\n"),
                    ("h2", "User-agent: *\nDisallow: /only$\n")]),
        "host string, allow boolean, like_pattern string, spec int",
    )
    urls = spark.createDataFrame(
        [
            ("u1", "h1", "/d/x"),        # matches /d only -> denied
            ("u2", "h1", "/d/keep/x"),   # longer Allow wins -> allowed
            ("u3", "h1", "/other"),      # host has rules, none match -> allowed
            ("u4", "h2", "/only"),       # $-anchored exact -> denied
            ("u5", "h2", "/only/more"),  # anchor prevents prefix match -> allowed
            ("u6", "h3", "/anything"),   # host without robots -> allowed
        ],
        "url string, host string, path string",
    )
    got = {r.url: r.allowed for r in robots_verdicts(urls, rules).collect()}
    assert got == {
        "u1": False, "u2": True, "u3": True,
        "u4": False, "u5": True, "u6": True,
    }
    assert len(got) == 6  # nobody dropped


def test_verdict_plan_broadcasts_rules(spark):
    rules = spark.createDataFrame(
        rules_rows([("h1", "User-agent: *\nDisallow: /d\n")]),
        "host string, allow boolean, like_pattern string, spec int",
    )
    urls = spark.range(100).select(
        F.concat(F.lit("u"), "id").alias("url"),
        F.lit("h1").alias("host"),
        F.concat(F.lit("/p/"), "id").alias("path"),
    )
    plan = (
        robots_verdicts(urls, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_sitemap_directives_group_independent(spark):
    """Sitemap: lines surface wherever they appear (group-independent),
    comments strip, matching is case-insensitive, hosts without a line
    emit nothing — and the rule parser still skips them (a fixture host
    with sitemap lines yields identical rules)."""
    from geokitten_spark.functions.robots import (
        parse_robots_txt,
        sitemap_directives,
    )

    txt = (
        "User-agent: *\nDisallow: /x\n"
        "sitemap: https://a.example/sm1.xml  # trailing comment\n"
        "User-agent: geokittenbot\nDisallow: /y\n"
        "SITEMAP: https://a.example/sm2.xml\n"
    )
    df = spark.createDataFrame(
        [("a.example", txt), ("b.example", "User-agent: *\nDisallow: /z\n")],
        "host string, robots_txt string",
    )
    got = sorted(
        (r["host"], r["sitemap_url"]) for r in sitemap_directives(df).collect()
    )
    assert got == [
        ("a.example", "https://a.example/sm1.xml"),
        ("a.example", "https://a.example/sm2.xml"),
    ]
    assert parse_robots_txt(txt) == [(False, "/y")]  # sitemap lines skipped
    plan = sitemap_directives(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
