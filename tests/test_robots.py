"""robots.txt parsing + frontier filtering (sources/robots.py):
RFC 9309 group resolution, longest-match semantics, tie rules."""

from __future__ import annotations

from nextbus2pg_spark.sources.robots import robots_allowed, robots_rules

ROBOTS_A = """
# comment line
Sitemap: https://a.com/sitemap.xml
Disallow: /ignored-before-any-group

User-agent: MegaBot
User-agent: OtherBot
Disallow: /private
Allow: /private/ok

User-agent: *
Disallow: /everything
"""

ROBOTS_B = """
User-agent: *
Disallow: /p
Allow: /p/sub
Disallow:
Crawl-delay: 10
"""


def _rules(spark, agent):
    robots = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
        "domain string, robots_txt string",
    )
    return robots_rules(robots, agent=agent)


def test_group_resolution_exact_beats_wildcard(spark):
    rules = {
        (r.domain, r.allow, r.prefix)
        for r in _rules(spark, "megabot").collect()
    }
    # a.com: ONLY the MegaBot group (exact match, case-insensitive);
    # b.com: the * group, empty Disallow dropped
    assert rules == {
        ("a.com", False, "/private"),
        ("a.com", True, "/private/ok"),
        ("b.com", False, "/p"),
        ("b.com", True, "/p/sub"),
    }


def test_group_resolution_falls_back_to_wildcard(spark):
    rules = {
        (r.domain, r.allow, r.prefix)
        for r in _rules(spark, "somebody-else").collect()
    }
    assert rules == {
        ("a.com", False, "/everything"),
        ("b.com", False, "/p"),
        ("b.com", True, "/p/sub"),
    }


def test_frontier_longest_match_and_defaults(spark):
    rules = _rules(spark, "megabot")
    urls = spark.createDataFrame(
        [
            ("https://a.com/private/x",),      # disallowed
            ("https://a.com/private/ok/y",),   # longest match allows
            ("https://a.com/public",),         # no match -> allowed
            ("https://a.com",),                # bare host -> path '/'
            ("https://b.com/p/z",),            # disallowed
            ("https://b.com/p/sub/z",),        # allowed
            ("https://unknown.org/x",),        # no robots -> allowed
        ],
        "url string",
    )
    got = {r.url: r.allowed for r in robots_allowed(urls, rules).collect()}
    assert got == {
        "https://a.com/private/x": False,
        "https://a.com/private/ok/y": True,
        "https://a.com/public": True,
        "https://a.com": True,
        "https://b.com/p/z": False,
        "https://b.com/p/sub/z": True,
        "https://unknown.org/x": True,
    }


def test_allow_wins_length_tie(spark):
    robots = spark.createDataFrame(
        [("t.com", "User-agent: *\nDisallow: /dir\nAllow: /dir\n")],
        "domain string, robots_txt string",
    )
    rules = robots_rules(robots, agent="x")
    urls = spark.createDataFrame([("https://t.com/dir/f",)], "url string")
    assert robots_allowed(urls, rules).collect()[0].allowed is True
