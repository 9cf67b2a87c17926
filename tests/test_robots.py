"""robots.txt policy filtering tests (operators/robots)."""

import pytest

from da_transform_judgments_pipeline_spark.operators.robots import (
    RobotsParseError,
    parse_robots,
    robots_filter,
    robots_rules,
)


def test_parse_groups_and_rules():
    c1 = "User-agent: *\nDisallow: /private/\nAllow: /private/public/\n"
    assert parse_robots(c1, "graftbot") == [
        ("/private/", False), ("/private/public/", True)
    ]
    # agent-specific group beats '*'; rules between user-agents split
    c2 = ("User-agent: graftbot\nDisallow: /tmp/\n\n"
          "User-agent: *\nDisallow: /\n")
    assert parse_robots(c2, "graftbot") == [("/tmp/", False)]
    assert parse_robots(c2, "otherbot") == [("/", False)]
    # consecutive user-agent lines form ONE group (RFC 9309 2.2.1)
    c3 = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(c3, "b") == [("/x", False)]
    # empty Disallow = no rule; trailing '*' is redundant and stripped;
    # comments ignored; unknown keys (Sitemap) skipped
    c4 = ("User-agent: *\nDisallow:\nDisallow: /y*  # tail\n"
          "Sitemap: https://x/s.xml\n")
    assert parse_robots(c4, "z") == [("/y", False)]
    assert parse_robots("", "z") == []
    with pytest.raises(RobotsParseError, match="literal-prefix"):
        parse_robots("User-agent: *\nDisallow: /a*b\n", "z")
    with pytest.raises(RobotsParseError, match="literal-prefix"):
        parse_robots("User-agent: *\nDisallow: /a$\n", "z")


def test_robots_filter_longest_match_and_broadcast(spark):
    """RFC 9309 precedence: longest match wins, Allow wins length ties,
    no match (or no robots row for the host) → allowed. The rules side
    joins as a broadcast (plan-asserted)."""
    from pyspark.sql import functions as F

    robots = spark.createDataFrame(
        [
            ("a.example",
             "User-agent: *\nDisallow: /p/\nAllow: /p/pub/\n"),
            ("tie.example",
             "User-agent: *\nDisallow: /dir/\nAllow: /dir/\n"),
            ("deny.example", "User-agent: *\nDisallow: /\n"),
        ],
        "host string, content string",
    )
    rules = robots_rules(robots, agent="graftbot")
    urls = spark.createDataFrame(
        [
            (0, "https://a.example/p/x"),
            (1, "https://a.example/p/pub/x"),
            (2, "https://a.example/other"),
            (3, "https://TIE.example/dir/x"),     # host case-folds
            (4, "https://deny.example/anything"),
            (5, "https://norobots.example/x"),    # no robots row
            (6, "https://a.example"),             # empty path → '/'
        ],
        "i long, url string",
    )
    out = robots_filter(urls, rules)
    got = {r["i"]: r["allowed"] for r in out.collect()}
    assert got == {0: False, 1: True, 2: True, 3: True, 4: False,
                   5: True, 6: True}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
