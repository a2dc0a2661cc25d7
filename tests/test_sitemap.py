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


def test_gzipped_sitemapindex_chain_end_to_end(spark, tmp_path):
    """Round-12 verdict item 4, the hermetic frontier recipe: a
    localhost host serves robots.txt advertising a GZIPPED
    <sitemapindex> (.xml.gz) whose children are GZIPPED <urlset>
    files; SitemapFetcher spools the advertised URL, the parse
    surfaces the kind='sitemap' children, ONE more fetch+parse round
    flattens the index, and the resulting page locs are the frontier.
    The gunzip is magic-byte-detected (one child lies with a .xml
    name), corrupt gzip quarantines by emptiness, and the ledger makes
    the second round incremental."""
    import gzip
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyspark.sql import functions as F

    from nextbus2pg_spark.sources.http_fetcher import (
        FeedHttpClient,
        SitemapFetcher,
    )
    from nextbus2pg_spark.sources.sitemap import sitemap_spool_entries

    pages = {
        "s1": [f"https://a.com/p/{i}" for i in range(3)],
        "s2": [f"https://a.com/q/{i}" for i in range(2)],
    }

    def urlset(urls):
        body = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
        return f"<urlset>{body}</urlset>".encode()

    files = {}
    # the index itself ships gzipped, children mixed: one honest
    # .xml.gz, one gzipped despite a plain .xml name, one corrupt
    files["/sitemap_index.xml.gz"] = gzip.compress(
        (
            "<sitemapindex>"
            "<sitemap><loc>{base}/s1.xml.gz</loc></sitemap>"
            "<sitemap><loc>{base}/s2.xml</loc></sitemap>"
            "<sitemap><loc>{base}/broken.xml.gz</loc></sitemap>"
            "</sitemapindex>"
        ).encode()
    )
    files["/s1.xml.gz"] = gzip.compress(urlset(pages["s1"]))
    files["/s2.xml"] = gzip.compress(urlset(pages["s2"]))  # lying name
    files["/broken.xml.gz"] = b"\x1f\x8b" + b"garbage-not-gzip"

    class H(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 - http.server API
            data = files.get(self.path)
            if data is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        files["/sitemap_index.xml.gz"] = gzip.compress(
            (
                "<sitemapindex>"
                f"<sitemap><loc>{base}/s1.xml.gz</loc></sitemap>"
                f"<sitemap><loc>{base}/s2.xml</loc></sitemap>"
                f"<sitemap><loc>{base}/broken.xml.gz</loc></sitemap>"
                "</sitemapindex>"
            ).encode()
        )
        robots = spark.createDataFrame(
            [(
                "a.com",
                f"Sitemap: {base}/sitemap_index.xml.gz\n"
                "User-agent: *\nDisallow: /private\n",
            )],
            "domain string, robots_txt string",
        )
        from nextbus2pg_spark.sources.sitemap import robots_sitemaps

        advertised = [
            r.sitemap_url for r in robots_sitemaps(robots).collect()
        ]
        assert advertised == [f"{base}/sitemap_index.xml.gz"]

        spool = tmp_path / "sitemaps"
        fetcher = SitemapFetcher(
            str(spool), client=FeedHttpClient(retries=1)
        )
        # round 1: the advertised index
        assert fetcher.fetch(advertised) == 1
        round1 = sitemap_spool_entries(spark, str(spool))
        children = [
            r.loc
            for r in round1.where(F.col("kind") == "sitemap").collect()
        ]
        assert sorted(children) == sorted(
            [f"{base}/s1.xml.gz", f"{base}/s2.xml", f"{base}/broken.xml.gz"]
        )
        # round 2: the one-level index hop; ledger skips the index
        assert fetcher.fetch(advertised + children) == 3
        entries = sitemap_spool_entries(spark, str(spool))
        frontier = {
            r.loc for r in entries.where(F.col("kind") == "url").collect()
        }
        assert frontier == set(pages["s1"]) | set(pages["s2"])
        # the corrupt child contributed zero rows (NULL xml), loudly
        # visible as a spooled-but-entryless sitemap_url
        parsed_urls = {
            r.sitemap_url for r in entries.select("sitemap_url").collect()
        }
        assert f"{base}/broken.xml.gz" not in parsed_urls
        # idempotent: everything spooled
        assert fetcher.fetch(advertised + children) == 0
    finally:
        srv.shutdown()


def test_robots_sitemaps_gauntlet(spark):
    """The full directive gauntlet (moved from the round-13 robots.py
    duplicate when it was folded back here): dedup, comment drop,
    relative-value drop, case-insensitive key with verbatim value,
    in-group directive still applying."""
    txt = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://r1.example/sitemap.xml\n"
        "Sitemap: https://cdn.example/maps/1.xml.gz\n"
        # exact duplicate dedups
        "Sitemap: https://r1.example/sitemap.xml\n"
        # commented-out line is dropped
        "# Sitemap: https://r1.example/commented.xml\n"
        # relative value is a site bug: dropped, not guessed at
        "Sitemap: /relative/map.xml\n"
        # case-insensitive key, value preserved verbatim
        "sitemap: HTTPS://r1.example/upper.xml\n"
        # directive inside a group still applies (cross-group per
        # sitemaps.org)
        "User-agent: other\nSitemap: https://r1.example/grouped.xml\n"
    )
    robots = spark.createDataFrame(
        [("r1.example", txt)], "domain string, robots_txt string"
    )
    got = {r.sitemap_url for r in robots_sitemaps(robots).collect()}
    assert got == {
        "https://r1.example/sitemap.xml",
        "https://cdn.example/maps/1.xml.gz",
        "HTTPS://r1.example/upper.xml",
        "https://r1.example/grouped.xml",
    }
