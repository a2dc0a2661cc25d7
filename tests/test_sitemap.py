"""sitemaps.org frontier seeding (sources/sitemap.py): Sitemap: line
discovery from robots.txt (group-independent, case-insensitive,
comment-tolerant) and native from_xml parsing of <urlset> /
<sitemapindex> documents with quarantine-by-emptiness for garbage."""

from __future__ import annotations

from nextbus2pg_spark.sources.sitemap import (
    robots_sitemaps,
    sitemap_entries,
)

ROBOTS = """
# header comment
Sitemap: https://a.com/sitemap.xml
User-agent: MegaBot
Disallow: /private
SITEMAP: https://a.com/news.xml  # trailing comment
User-agent: *
Disallow: /
sitemap:https://a.com/extra.xml
"""


def test_robots_sitemap_lines_are_group_independent(spark):
    robots = spark.createDataFrame(
        [("a.com", ROBOTS), ("b.com", "User-agent: *\nDisallow: /x\n")],
        "domain string, robots_txt string",
    )
    got = {
        (r.domain, r.sitemap_url)
        for r in robots_sitemaps(robots).collect()
    }
    # all three lines found — inside groups, any case, no-space colon;
    # b.com advertises none
    assert got == {
        ("a.com", "https://a.com/sitemap.xml"),
        ("a.com", "https://a.com/news.xml"),
        ("a.com", "https://a.com/extra.xml"),
    }


URLSET = (
    '<?xml version="1.0"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://a.com/p/1</loc><lastmod>2026-01-02</lastmod>"
    "<priority>0.8</priority></url>"
    "<url><loc>https://a.com/p/2</loc></url>"
    "</urlset>"
)
INDEX = (
    "<sitemapindex>"
    "<sitemap><loc>https://a.com/s1.xml</loc></sitemap>"
    "<sitemap><loc>https://a.com/s2.xml</loc>"
    "<lastmod>2026-02-01</lastmod></sitemap>"
    "</sitemapindex>"
)


def test_sitemap_entries_parse_both_shapes(spark):
    df = spark.createDataFrame(
        [("a.com", URLSET), ("a.com", INDEX), ("bad.com", "not xml <")],
        "domain string, xml string",
    )
    rows = sitemap_entries(df, keep_cols=["domain"]).collect()
    got = {(r.domain, r.kind, r.loc, r.lastmod) for r in rows}
    # pages from the urlset, one-more-hop locs from the index, and
    # ZERO rows from the malformed document
    assert got == {
        ("a.com", "url", "https://a.com/p/1", "2026-01-02"),
        ("a.com", "url", "https://a.com/p/2", None),
        ("a.com", "sitemap", "https://a.com/s1.xml", None),
        ("a.com", "sitemap", "https://a.com/s2.xml", "2026-02-01"),
    }


def test_sitemap_frontier_composes_with_robots_filter(spark):
    """The frontier seam end-to-end: seeds from the sitemap, verdicts
    from the robots rules of the SAME file."""
    from pyspark.sql import functions as F

    from nextbus2pg_spark.sources.robots import (
        robots_allowed,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [(
            "a.com",
            "Sitemap: https://a.com/sitemap.xml\n"
            "User-agent: *\nDisallow: /p/1$\n",
        )],
        "domain string, robots_txt string",
    )
    assert robots_sitemaps(robots).count() == 1
    seeds = sitemap_entries(
        spark.createDataFrame([(URLSET,)], "xml string")
    ).where(F.col("kind") == "url").select(F.col("loc").alias("url"))
    verdicts = {
        r.url: r.allowed
        for r in robots_allowed(
            seeds, robots_rules(robots, agent="databot")
        ).collect()
    }
    assert verdicts == {
        "https://a.com/p/1": False,  # the end-anchored rule
        "https://a.com/p/2": True,
    }
