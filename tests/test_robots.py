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


WILD = (
    "User-agent: *\n"
    "Disallow: /*.php\n"      # any path containing '.php'
    "Disallow: /private$\n"   # exactly /private, nothing under it
    "Allow: /*.php/pub\n"     # longer wildcard Allow beats the Disallow
    "Disallow: /p*/q$\n"      # 6 octets
    "Allow: /*9/q\n"          # 5 octets -> loses to the line above
    "Disallow: /p9\n"         # 3 octets
)


def test_wildcard_star_and_end_anchor(spark):
    """RFC 9309 §2.2.3: '*' matches any sequence, trailing '$' anchors
    to the end of the path, and specificity is the rule value's octet
    length (wildcards included)."""
    robots = spark.createDataFrame(
        [("w.com", WILD)], "domain string, robots_txt string"
    )
    rules = robots_rules(robots, agent="x")
    got = {
        r.url: r.allowed
        for r in robots_allowed(
            spark.createDataFrame(
                [
                    ("https://w.com/a.php",),        # /*.php
                    ("https://w.com/dir/b.php?x",),  # mid-path match
                    ("https://w.com/a.phtml",),      # no match
                    ("https://w.com/private",),      # /private$ fires
                    ("https://w.com/private/x",),    # anchor blocks it
                    ("https://w.com/x.php/pub",),    # longer Allow wins
                    ("https://w.com/p9/q",),         # /p*/q$ (6) > /*9/q (5)
                ],
                "url string",
            ),
            rules,
        ).collect()
    }
    assert got == {
        "https://w.com/a.php": False,
        "https://w.com/dir/b.php?x": False,
        "https://w.com/a.phtml": True,
        "https://w.com/private": False,
        "https://w.com/private/x": True,
        "https://w.com/x.php/pub": True,
        "https://w.com/p9/q": False,
    }


def test_wildcard_translation_escapes_regex_literals(spark):
    """Rule values full of regex metachars must match literally —
    only '*' and a trailing '$' are special."""
    robots = spark.createDataFrame(
        [("m.com", "User-agent: *\nDisallow: /a(b)+c.d|e\n")],
        "domain string, robots_txt string",
    )
    rules = robots_rules(robots, agent="x")
    row = rules.collect()[0]
    assert row.has_wild is False  # literal value: startswith fast path
    got = {
        r.url: r.allowed
        for r in robots_allowed(
            spark.createDataFrame(
                [
                    ("https://m.com/a(b)+c.d|e/f",),  # literal prefix
                    ("https://m.com/abbc.d|e/f",),    # regex would match
                ],
                "url string",
            ),
            rules,
        ).collect()
    }
    assert got == {
        "https://m.com/a(b)+c.d|e/f": False,
        "https://m.com/abbc.d|e/f": True,
    }


def test_wildcard_metachars_escaped_inside_wild_rule(spark):
    """A rule mixing '*' with regex metachars: the metachars stay
    literal in the translated pattern."""
    robots = spark.createDataFrame(
        [("m.com", "User-agent: *\nDisallow: /x.y*(z)$\n")],
        "domain string, robots_txt string",
    )
    rules = robots_rules(robots, agent="x")
    got = {
        r.url: r.allowed
        for r in robots_allowed(
            spark.createDataFrame(
                [
                    ("https://m.com/x.y123(z)",),  # matches: '.' literal
                    ("https://m.com/xAy123(z)",),  # '.' must not be regex-dot
                    ("https://m.com/x.y123(z)/t",),  # '$' anchor blocks
                ],
                "url string",
            ),
            rules,
        ).collect()
    }
    assert got == {
        "https://m.com/x.y123(z)": False,
        "https://m.com/xAy123(z)": True,
        "https://m.com/x.y123(z)/t": True,
    }


def test_allow_wins_length_tie(spark):
    robots = spark.createDataFrame(
        [("t.com", "User-agent: *\nDisallow: /dir\nAllow: /dir\n")],
        "domain string, robots_txt string",
    )
    rules = robots_rules(robots, agent="x")
    urls = spark.createDataFrame([("https://t.com/dir/f",)], "url string")
    assert robots_allowed(urls, rules).collect()[0].allowed is True
