"""The LIVE crawl loop end-to-end against a localhost http.server:
robots fetch → rules, seed page fetch → spool → parsed frame,
crawl_loop with the real PageFetcher (ledger, throttle, no-follow
redirects), ending in a crawled corpus with depths — every HTTP
request accounted for, the disallowed path never requested, every
page fetched exactly once."""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from nextbus2pg_spark.sources.http_fetcher import (
    FeedHttpClient,
    HostThrottle,
    PageFetcher,
    RobotsFetcher,
    page_fetch_fn,
    page_spool_frame,
    robots_spool_frame,
)


class _SiteHandler(BaseHTTPRequestHandler):
    """A deterministic five-page site with a robots.txt, a 301, and a
    404. Records every requested path."""

    requests: "list[str]" = []

    PAGES = {
        "/": (
            '<a href="/a.html">a</a><a href="/b.html">b</a>'
            '<a href="/private/x.html">p</a>'
            '<a href="/moved.html">m</a>'
            '<a href="/missing.html">gone</a>'
        ),
        "/a.html": '<a href="/c.html">c</a><a href="/a.html">self</a>',
        "/b.html": '<a href="/c.html">c</a>',
        "/c.html": "<p>leaf c</p>",
        "/target.html": "<p>moved target</p>",
        "/private/x.html": "<p>never served</p>",
    }

    def do_GET(self):  # noqa: N802 - http.server API
        path = urllib.parse.urlparse(self.path).path
        type(self).requests.append(path)
        if path == "/robots.txt":
            body = b"User-agent: *\nDisallow: /private/\n"
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if path == "/moved.html":
            self.send_response(301)
            # relative Location: RFC 9110 allows it; the parser must
            # resolve it absolute
            self.send_header("Location", "/target.html")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        page = self.PAGES.get(path)
        if page is None:
            body = b"<p>not found</p>"
            self.send_response(404)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        body = f"<html><body>{page}</body></html>".encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # noqa: D102 - silence
        pass


@pytest.fixture()
def site():
    _SiteHandler.requests = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SiteHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host = f"127.0.0.1:{srv.server_address[1]}"
    yield host
    srv.shutdown()
    srv.server_close()


def test_live_crawl_loop_end_to_end(spark, site, tmp_path):
    from nextbus2pg_spark.pipelines.frontier import crawl_loop

    base = f"http://{site}"
    client = FeedHttpClient(timeout_s=5.0, retries=2, backoff_s=0.01)
    throttle = HostThrottle(0.0)

    # robots hop: host -> spooled robots.txt -> rules frame
    rf = RobotsFetcher(
        str(tmp_path / "robots"), client=client, throttle=throttle,
        scheme="http",
    )
    assert rf.fetch([site]) == 1
    robots = robots_spool_frame(spark, str(tmp_path / "robots"))

    # seed fetch: the site root
    pf = PageFetcher(
        str(tmp_path / "pages"), client=client, throttle=throttle
    )
    assert pf.fetch([base + "/"]) == 1
    seed = page_spool_frame(spark, str(tmp_path / "pages")).select(
        "uri", "content", "http_status", "location"
    )

    fetch = page_fetch_fn(pf, spark)

    def fetch_std(urls_df):
        return fetch(urls_df).select(
            "uri", "content", "http_status", "location"
        )

    corpus = crawl_loop(
        seed, robots, "testbot", fetch_std,
        max_iters=4, page_budget=10,
    )
    got = {(r.uri, r.http_status, r.depth) for r in corpus.collect()}
    assert got == {
        (base + "/", 200, 0),
        (base + "/a.html", 200, 1),
        (base + "/b.html", 200, 1),
        (base + "/moved.html", 301, 1),
        (base + "/missing.html", 404, 1),
        # depth 2: /c.html via a+b links, /target.html via the 301's
        # resolved-absolute Location
        (base + "/c.html", 200, 2),
        (base + "/target.html", 200, 2),
    }
    # the 301 row carries its Location resolved ABSOLUTE
    moved = [
        r for r in corpus.collect() if r.uri == base + "/moved.html"
    ][0]
    assert moved.location == base + "/target.html"
    assert moved.content is None or moved.content == ""

    # the disallowed path was NEVER requested; everything else exactly
    # once (ledger: no refetches across iterations)
    paths = _SiteHandler.requests
    assert "/private/x.html" not in paths
    assert paths.count("/robots.txt") == 1
    for p in ("/", "/a.html", "/b.html", "/c.html", "/moved.html",
              "/missing.html", "/target.html"):
        assert paths.count(p) == 1, (p, paths)


def test_page_fetcher_ledger_resume(spark, site, tmp_path):
    """A second fetch of the same URLs is a no-op (filenames are the
    ledger), and the spool frame parses the 404 body as content."""
    base = f"http://{site}"
    pf = PageFetcher(
        str(tmp_path / "pages"),
        client=FeedHttpClient(timeout_s=5.0, retries=2, backoff_s=0.01),
    )
    urls = [base + "/c.html", base + "/missing.html"]
    assert pf.fetch(urls) == 2
    assert pf.fetch(urls) == 0
    rows = {
        r.uri: r
        for r in page_spool_frame(
            spark, str(tmp_path / "pages")
        ).collect()
    }
    assert rows[base + "/c.html"].http_status == 200
    assert "leaf c" in rows[base + "/c.html"].content
    assert rows[base + "/missing.html"].http_status == 404
    assert "not found" in rows[base + "/missing.html"].content
    assert rows[base + "/missing.html"].parse_error is None


def _make_site_handler(pages, redirects=()):
    """A fresh handler class (class-level PAGES/requests) for one
    server instance."""

    class _H(BaseHTTPRequestHandler):
        PAGES = dict(pages)
        REDIRECTS = dict(redirects)
        requests: "list[str]" = []
        robots = b"User-agent: *\n"

        def do_GET(self):  # noqa: N802 - http.server API
            path = urllib.parse.urlparse(self.path).path
            type(self).requests.append(path)
            if path == "/robots.txt":
                body = type(self).robots
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if path in self.REDIRECTS:
                self.send_response(301)
                self.send_header("Location", self.REDIRECTS[path])
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            page = self.PAGES.get(path)
            body = (
                b"<p>not found</p>"
                if page is None
                else f"<html><body>{page}</body></html>".encode()
            )
            self.send_response(404 if page is None else 200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # noqa: D102 - silence
            pass

    return _H


def _serve(handler):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"127.0.0.1:{srv.server_address[1]}"


def test_crawl_loop_robots_fn_gates_new_hosts(spark, tmp_path):
    """The robots HOP: a host discovered mid-crawl gets its robots.txt
    fetched BEFORE its URLs are queued — the disallowed page on the
    new host is never requested, and the hop's ledger fetches each
    host's robots exactly once (round-13 review: seed-time-only robots
    default-allowed unknown hosts)."""
    from nextbus2pg_spark.pipelines.frontier import crawl_loop

    h2_handler = _make_site_handler(
        {"/ok.html": "<p>fine</p>", "/private/x.html": "<p>no</p>"}
    )
    h2_handler.robots = b"User-agent: *\nDisallow: /private/\n"
    srv2, host2 = _serve(h2_handler)
    h1_handler = _make_site_handler(
        {
            "/": (
                f'<a href="http://__H2__/ok.html">ok</a>'
                f'<a href="http://__H2__/private/x.html">no</a>'
            ).replace("__H2__", host2)
        }
    )
    srv1, host1 = _serve(h1_handler)
    try:
        client = FeedHttpClient(
            timeout_s=5.0, retries=2, backoff_s=0.01
        )
        rf = RobotsFetcher(
            str(tmp_path / "robots"), client=client, scheme="http"
        )
        pf = PageFetcher(str(tmp_path / "pages"), client=client)

        # seed: host1 root (its robots fetched by the hop too)
        assert pf.fetch([f"http://{host1}/"]) == 1
        seed = page_spool_frame(
            spark, str(tmp_path / "pages")
        ).select("uri", "content", "http_status", "location")

        def robots_fn(hosts):
            rf.fetch(hosts)
            return robots_spool_frame(spark, str(tmp_path / "robots"))

        fetch = page_fetch_fn(pf, spark)

        def fetch_std(urls_df):
            return fetch(urls_df).select(
                "uri", "content", "http_status", "location"
            )

        corpus = crawl_loop(
            seed, robots_spool_frame(spark, str(tmp_path / "robots")),
            "testbot", fetch_std, max_iters=2, page_budget=10,
            robots_fn=robots_fn,
        )
        got = {(r.uri, r.depth) for r in corpus.collect()}
        assert got == {
            (f"http://{host1}/", 0),
            (f"http://{host2}/ok.html", 1),
        }
        # the new host's robots was consulted, its disallowed path
        # never requested
        assert "/robots.txt" in h2_handler.requests
        assert h2_handler.requests.count("/robots.txt") == 1
        assert "/private/x.html" not in h2_handler.requests
        assert h2_handler.requests.count("/ok.html") == 1
    finally:
        srv1.shutdown(); srv1.server_close()
        srv2.shutdown(); srv2.server_close()


def test_page_spool_frame_preserves_long_urls(spark, site, tmp_path):
    """A URL whose percent-encoded form exceeds the spool-name cap
    round-trips through the spool via the leading URL line — the
    digest-capped FILENAME is not reversible (round-13 review: such
    pages were fetched, ledgered, and silently absent from the
    frame)."""
    base = f"http://{site}"
    long_url = base + "/long/" + "q" * 300 + ".html"
    pf = PageFetcher(
        str(tmp_path / "pages"),
        client=FeedHttpClient(timeout_s=5.0, retries=2, backoff_s=0.01),
    )
    assert pf.fetch([long_url]) == 1
    # the ledger name IS digest-capped...
    assert "--sha1-" in pf.spool_name(long_url)
    assert pf.fetch([long_url]) == 0
    # ...but the frame still carries the full URL
    rows = {
        r.uri: r
        for r in page_spool_frame(
            spark, str(tmp_path / "pages")
        ).collect()
    }
    assert long_url in rows
    assert rows[long_url].http_status == 404


def test_live_crawl_to_warc_roundtrip(spark, site, tmp_path):
    """The full circle: live crawl -> corpus -> WET-style WARC shard
    export -> standard re-ingest. What the crawl fetched is exactly
    what a WARC consumer reads back."""
    from nextbus2pg_spark.pipelines.frontier import crawl_loop
    from nextbus2pg_spark.sources.warc import (
        warc_archive_files,
        warc_documents,
        write_warc_shards,
    )

    base = f"http://{site}"
    pf = PageFetcher(
        str(tmp_path / "pages"),
        client=FeedHttpClient(timeout_s=5.0, retries=2, backoff_s=0.01),
    )
    rf = RobotsFetcher(
        str(tmp_path / "robots"),
        client=FeedHttpClient(timeout_s=5.0, retries=2, backoff_s=0.01),
        scheme="http",
    )
    assert rf.fetch([site]) == 1
    assert pf.fetch([base + "/"]) == 1
    seed = page_spool_frame(spark, str(tmp_path / "pages")).select(
        "uri", "content", "http_status", "location"
    )
    fetch = page_fetch_fn(pf, spark)
    corpus = crawl_loop(
        seed,
        robots_spool_frame(spark, str(tmp_path / "robots")),
        "testbot",
        lambda u: fetch(u).select(
            "uri", "content", "http_status", "location"
        ),
        max_iters=3,
        page_budget=10,
    )
    # export the 200-status text to WARC shards...
    kept = corpus.where(
        (F.col("http_status") == 200) & F.col("content").isNotNull()
    ).select("uri", "content")
    out = str(tmp_path / "export")
    manifest = {
        r.filename: r.n_records
        for r in write_warc_shards(kept, out, n_shards=2).collect()
    }
    assert sum(manifest.values()) == kept.count()
    # ...and read them back with the standard ingest path
    # (warc_documents keys archives by id; derive one from the name)
    back = warc_documents(
        warc_archive_files(spark, out).select(
            F.xxhash64("filename").alias("archive_id"), "payload"
        )
    )
    got = {(r.uri, r.content) for r in back.collect()}
    want = {(r.uri, r.content) for r in kept.collect()}
    assert got == want
