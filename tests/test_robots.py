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


def test_robots_matcher_matches_independent_reference(spark):
    """Differential oracle (round 12): a from-the-spec Python
    reference of RFC 9309 grouping + longest-match + allow-on-tie +
    §2.2.3 wildcard semantics, compared against the DataFrame
    implementation over ~60 seeded-random robots files and ~360
    frontier URLs (regex metachars in rule values, '*' runs, '$'
    anchors, exact-vs-* group selection, comments, unknown
    directives, rules before any group, empty Disallow, domains with
    no robots at all) — one Spark job."""
    import random
    import re

    from nextbus2pg_spark.sources.robots import (
        robots_allowed,
        robots_rules,
    )

    AGENT = "DataBot"

    def ref_rules(text, agent):
        """Independent reference: parse per RFC 9309 §2.2.1 (unknown
        directives are invisible to the group state machine; rules
        before any User-agent line are ignored; exact-agent groups
        shadow the '*' groups)."""
        recs = []
        for raw in text.split("\n"):
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            m = re.match(r"(?i)^([a-z-]+)\s*:(.*)$", line)
            if not m:
                continue
            key, value = m.group(1).lower(), m.group(2).strip()
            if key in ("user-agent", "allow", "disallow"):
                recs.append((key, value))
        groups = []  # (agents:list, rules:list)
        prev_key = None
        for key, value in recs:
            if key == "user-agent":
                if prev_key != "user-agent":
                    groups.append(([], []))
                groups[-1][0].append(value)
            elif groups:
                groups[-1][1].append((key == "allow", value))
            prev_key = key
        exact = [
            g for g in groups
            if any(a.lower() == agent.lower() for a in g[0])
        ]
        chosen = exact or [
            g for g in groups if any(a == "*" for a in g[0])
        ]
        return [r for g in chosen for r in g[1] if r[1] != ""]

    def ref_match(value, path):
        anchored = value.endswith("$")
        body = value[:-1] if anchored else value
        pat = "".join(
            ".*" if ch == "*" else re.escape(ch) for ch in body
        )
        return re.match("^" + pat + ("$" if anchored else ""), path) is not None

    def ref_allowed(rules, path):
        best = None
        for allow, value in rules:
            if ref_match(value, path):
                key = (len(value.encode()), 1 if allow else 0)
                if best is None or key > best:
                    best = key
        return True if best is None else best[1] == 1

    rng = random.Random(1234)
    agents_pool = ["DataBot", "databot", "OtherBot", "*", "Mega*Bot"]
    segs = ["a", "b", "ab", "a.b", "(x)", "c+d", "img"]

    def rule_value():
        n = rng.randrange(1, 4)
        v = "".join(
            "/" + (rng.choice(segs) if rng.random() < 0.8 else "*")
            for _ in range(n)
        )
        if rng.random() < 0.25:
            v += "*"
        if rng.random() < 0.3:
            v += "$"
        if rng.random() < 0.05:
            v = ""  # the allow-all idiom: matches nothing
        return v

    def robots_file():
        parts = []
        if rng.random() < 0.2:
            parts.append("Disallow: /orphan-rule-before-any-group\n")
        if rng.random() < 0.5:
            parts.append("Sitemap: https://x.example/s.xml\n")
        for _ in range(rng.randrange(1, 4)):
            for _ in range(rng.randrange(1, 3)):
                parts.append(f"User-agent: {rng.choice(agents_pool)}\n")
            if rng.random() < 0.3:
                parts.append("Crawl-delay: 5\n")  # invisible to groups
            for _ in range(rng.randrange(0, 4)):
                kind = "Allow" if rng.random() < 0.4 else "Disallow"
                parts.append(f"{kind}: {rule_value()}  # c\n")
        return "".join(parts)

    domains = [f"d{i}.example" for i in range(12)]
    files = {d: robots_file() for d in domains[:10]}  # 2 have none
    urls = []
    for d in domains:
        for _ in range(30):
            depth = rng.randrange(1, 4)
            path = "".join("/" + rng.choice(segs) for _ in range(depth))
            urls.append(f"https://{d}{path}")
    urls = sorted(set(urls))

    robots = spark.createDataFrame(
        list(files.items()), "domain string, robots_txt string"
    )
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: r.allowed
        for r in robots_allowed(
            frontier, robots_rules(robots, AGENT)
        ).collect()
    }
    assert set(got) == set(urls)
    mismatches = []
    for u in urls:
        d = re.match(r"https://([^/]+)(/.*)$", u)
        rules = ref_rules(files.get(d.group(1), ""), AGENT)
        want = ref_allowed(rules, d.group(2))
        if got[u] != want:
            mismatches.append((u, got[u], want, files.get(d.group(1))))
    assert not mismatches, mismatches[:3]


def test_robots_crawl_delays_group_resolution_and_max(spark):
    """Crawl-delay surfaces per domain for the applicable group only
    (exact agent beats *), multiple declarations take the MAX, and
    garbage values are dropped — robots_rules keeps ignoring the
    directive (it is a throttle input, never a fetch-permission
    rule)."""
    from nextbus2pg_spark.sources.robots import (
        robots_crawl_delays,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [
            (
                "a.example",
                "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
                "User-agent: nb2pg\nCrawl-delay: 7\n"
                "User-agent: nb2pg\nCrawl-delay: 3\n",
            ),
            ("b.example", "User-agent: *\nCrawl-delay: 1.5\n"),
            ("c.example", "User-agent: *\nCrawl-delay: soon\n"),
            ("d.example", "User-agent: *\nDisallow: /private\n"),
        ],
        "domain string, robots_txt string",
    )
    got = {
        r.domain: r.crawl_delay_s
        for r in robots_crawl_delays(robots, agent="nb2pg").collect()
    }
    # exact-agent groups win; their two declarations collapse to MAX
    assert got == {"a.example": 7.0, "b.example": 1.5}
    wild = {
        r.domain: r.crawl_delay_s
        for r in robots_crawl_delays(robots, agent="otherbot").collect()
    }
    assert wild == {"a.example": 2.0, "b.example": 1.5}
    # the permission rules are unaffected by Crawl-delay lines
    rules = robots_rules(robots, agent="otherbot").collect()
    assert {(r.domain, r.prefix) for r in rules} == {
        ("a.example", "/x"), ("d.example", "/private"),
    }


def test_crawl_delay_group_boundaries_respect_other_directives(spark):
    """Round-13 review: group boundaries are a property of the FILE —
    a Disallow line ends agent a's User-agent run even for the
    crawl-delay caller, so the * group's Crawl-delay must not leak
    onto agent a; symmetrically a Crawl-delay line separates groups
    for the allow/disallow caller."""
    from nextbus2pg_spark.sources.robots import (
        robots_allowed,
        robots_crawl_delays,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [
            (
                "a.example",
                "User-agent: a\nDisallow: /x\n\n"
                "User-agent: *\nCrawl-delay: 5\n",
            ),
            (
                "b.example",
                "User-agent: b\nCrawl-delay: 7\n"
                "User-agent: *\nDisallow: /y\n",
            ),
        ],
        "domain string, robots_txt string",
    )
    # agent a has its own group (no delay declared): the * group's
    # delay must not apply
    assert robots_crawl_delays(robots, "a").where(
        "domain = 'a.example'"
    ).count() == 0
    # ...and the * group still serves agents without an exact group
    delays = {
        r.domain: r.crawl_delay_s
        for r in robots_crawl_delays(robots, "other").collect()
    }
    assert delays["a.example"] == 5.0
    # on b.example the Crawl-delay line ENDS agent b's run, so the
    # following 'User-agent: *' heads a NEW group and its Disallow
    # must not bind agent b
    urls = spark.createDataFrame(
        [("https://b.example/y/page",)], "url string"
    )
    rules_b = robots_rules(robots, "b")
    verdict = robots_allowed(urls, rules_b).collect()[0]
    assert verdict.allowed is True
    # while agent 'other' (no exact group) IS bound by it
    verdict_o = robots_allowed(
        urls, robots_rules(robots, "other")
    ).collect()[0]
    assert verdict_o.allowed is False
    # and b's own delay survives
    assert {
        r.domain: r.crawl_delay_s
        for r in robots_crawl_delays(robots, "b").collect()
    }["b.example"] == 7.0
