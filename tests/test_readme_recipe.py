"""The README's curation-recipe code block, executed verbatim (round-6
verdict task #7: one documented entry tying ingest → quality → dedup →
mixture → split → shard together). The block is extracted from
README.md at test time, so the doc cannot drift from the code."""

from __future__ import annotations

import glob
import re

SF_DIR = "/root/testdata/sf0.001"


def _recipe_block() -> str:
    text = open("/root/repo/README.md", encoding="utf-8").read()
    section = text.split("## The curation recipe", 1)[1]
    m = re.search(r"```python\n(.*?)```", section, re.DOTALL)
    assert m, "README recipe block missing"
    return m.group(1)


def test_readme_recipe_runs_verbatim(spark, tmp_path):
    ns = {"spark": spark, "sf_dir": SF_DIR, "out_dir": str(tmp_path)}
    exec(compile(_recipe_block(), "README.md", "exec"), ns)  # noqa: S102

    # the export landed as one sorted file per shard directory
    shard_dirs = glob.glob(f"{tmp_path}/train_ep1/shard=*")
    assert shard_dirs, "no shards written"
    for d in shard_dirs:
        assert len(glob.glob(f"{d}/*.parquet")) == 1, d

    # the assembled frame carries the documented contract columns
    assembled = ns["assembled"]
    assert {"split", "shard", "shuffle_key"} <= set(assembled.columns)

    # observe-powered stage counters filled on the first action and
    # are monotonically non-increasing through the drop stages
    counts = {k: v["n"] for k, v in ns["stage_counts"].items()}
    assert counts["input"] > 0
    order = ["input", "quality_lang", "exact_dedup", "near_dedup",
             "decontaminated"]
    vals = [counts[s] for s in order]
    assert vals == sorted(vals, reverse=True), counts

    # the audit report aggregates the exported corpus
    audit = {
        (r["source"], r["split"]): r["n_docs"]
        for r in ns["audit"].collect()
    }
    assert audit and all(n > 0 for n in audit.values())
    assert {s for s, _ in audit} <= {"src0", "src1", "src2"}

    # epoch 2 reshuffles without moving a row across the split
    from nextbus2pg_spark.pipelines.corpus_assembly import assemble_corpus
    ep2 = assemble_corpus(
        ns["curated"].withColumn(
            "n_tokens", ns["token_count"](ns["F"].col("text"))
        ),
        ns["edges"],
        weights={"src0": 3, "src1": 1, "src2": 1},
        token_budget=12_000, epoch=2, n_shards=8,
    )
    s1 = {(r["doc_id"], r["split"]) for r in
          assembled.select("doc_id", "split").collect()}
    s2 = {(r["doc_id"], r["split"]) for r in
          ep2.select("doc_id", "split").collect()}
    assert s1 == s2


def test_readme_monitoring_recipe_runs_verbatim(spark):
    text = open("/root/repo/README.md", encoding="utf-8").read()
    section = text.split("## The monitoring recipe", 1)[1]
    m = re.search(r"```python\n(.*?)```", section, re.DOTALL)
    assert m, "README monitoring block missing"
    ns = {"spark": spark, "sf_dir": SF_DIR}
    exec(compile(m.group(1), "README.md#monitoring", "exec"), ns)  # noqa: S102
    spikes, drifts, outages = ns["n_flags"]
    assert spikes >= 0 and drifts >= 0 and outages >= 0
    # the frames carry the documented contract columns
    assert {"zscore", "is_anomaly"} <= set(ns["spikes"].columns)
    assert {"cusum_pos", "cusum_neg", "is_change"} <= set(
        ns["drifts"].columns
    )
    assert {"level", "trend", "forecast"} <= set(ns["forecasts"].columns)
    assert {"gap_start", "gap_end", "gap_seconds"} <= set(
        ns["outages"].columns
    )


def _crawl_recipe_block() -> str:
    text = open("/root/repo/README.md", encoding="utf-8").read()
    section = text.split("## The crawl-ingestion recipe", 1)[1]
    m = re.search(r"```python\n(.*?)```", section, re.DOTALL)
    assert m, "README crawl recipe block missing"
    return m.group(1)


def test_readme_crawl_recipe_runs_verbatim(spark, tmp_path):
    """The round-11 crawl seam as ONE documented pipeline, executed
    verbatim against a hermetic localhost archive host: CDX delta →
    robots wildcard filter → HTTP-Range fetch → parsed documents.
    Only the robots-permitted `added` pages ever cost bytes."""
    import json as _json
    import threading
    from http.server import ThreadingHTTPServer

    from tests.test_range_fetch import _ArchiveHandler

    from nextbus2pg_spark.sources.warc import warc_write_records

    pages = {
        i: (
            f"https://h{i % 2}.example.org/p/{i}",
            f"crawl page {i} body content " * 3,
        )
        for i in range(8)
    }
    # the new crawl's archive: one gzip member per page
    blob = bytearray()
    spans = {}
    for i, (url, text) in pages.items():
        body = text.encode()
        member = warc_write_records(
            [{
                "type": "response", "uri": url,
                "date": "2026-02-01T00:00:00Z",
                "record_id": f"urn:new:{i}",
                "block": (
                    b"HTTP/1.1 200 OK\r\nContent-Length: "
                    + str(len(body)).encode() + b"\r\n\r\n" + body
                ),
            }],
            gzip_members=True,
        )
        spans[i] = (len(blob), len(member))
        blob += member

    def cdx_line(i, ts, digest, filename, offset, length):
        url, _ = pages[i]
        surt = f"org,example,h{i % 2})/p/{i}"
        return f"{surt} {ts} " + _json.dumps({
            "url": url, "mime": "text/plain", "status": "200",
            "digest": digest, "length": str(length),
            "offset": str(offset), "filename": filename,
        })

    old_lines = [
        cdx_line(i, "20260101000000", f"sha1:D{i}", "old-00.warc.gz",
                 i * 1000, 900)
        for i in range(4)  # pages 0-3 unchanged since the old crawl
    ]
    new_lines = [
        cdx_line(
            i, "20260201000000",
            f"sha1:D{i}" if i < 4 else f"sha1:N{i}",
            "new-00.warc.gz", spans[i][0], spans[i][1],
        )
        for i in range(8)
    ]
    old_index = tmp_path / "old.cdxj"
    new_index = tmp_path / "new.cdxj"
    old_index.write_text("\n".join(old_lines))
    new_index.write_text("\n".join(new_lines))

    # robots: h0 allows everything; h1 end-anchors /p/5 away
    robots = spark.createDataFrame(
        [
            ("h0.example.org", "User-agent: *\nDisallow:\n"),
            ("h1.example.org", "User-agent: *\nDisallow: /p/5$\n"),
        ],
        "domain string, robots_txt string",
    )

    _ArchiveHandler.files = {"new-00.warc.gz": bytes(blob)}
    _ArchiveHandler.requests = []
    _ArchiveHandler.ignore_range = False
    _ArchiveHandler.fail_next = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ArchiveHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ns = {
            "spark": spark,
            "old_index_path": str(old_index),
            "new_index_path": str(new_index),
            "robots": robots,
            "archive_base_url":
                f"http://127.0.0.1:{srv.server_address[1]}",
            "spool_dir": str(tmp_path / "spool"),
        }
        exec(  # noqa: S102
            compile(_crawl_recipe_block(), "README.md", "exec"), ns
        )
        got = {
            r.uri: (r.content, r.content_length)
            for r in ns["crawl_docs"].collect()
        }
        # added = pages 4-7; robots drops /p/5 (the '$'-anchored rule)
        want_pages = [4, 6, 7]
        assert got == {
            pages[i][0]: (pages[i][1], len(pages[i][1]))
            for i in want_pages
        }
        # every byte moved was a ranged read of a single record
        assert _ArchiveHandler.requests
        assert all(
            r and r.startswith("bytes=") for r in _ArchiveHandler.requests
        )
        assert len(_ArchiveHandler.requests) == len(want_pages)
    finally:
        srv.shutdown()


def test_readme_frontier_recipe_runs_verbatim(spark, tmp_path):
    """The round-12 frontier-seeding recipe as ONE documented pipeline,
    executed verbatim against a hermetic localhost host: robots →
    gzipped sitemapindex → gzipped urlsets → robots-filtered frontier."""
    import gzip as _gzip
    import re as _re
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from nextbus2pg_spark.sources.http_fetcher import FeedHttpClient

    text = open("/root/repo/README.md", encoding="utf-8").read()
    section = text.split("## The frontier-seeding recipe", 1)[1]
    m = _re.search(r"```python\n(.*?)```", section, _re.DOTALL)
    assert m, "README frontier recipe block missing"

    def urlset(urls):
        body = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
        return _gzip.compress(f"<urlset>{body}</urlset>".encode())

    files = {}

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
        files["/s1.xml.gz"] = urlset(
            ["https://a.com/keep/1", "https://a.com/private/2"]
        )
        files["/s2.xml.gz"] = urlset(["https://a.com/keep/3"])
        files["/index.xml.gz"] = _gzip.compress(
            (
                "<sitemapindex>"
                f"<sitemap><loc>{base}/s1.xml.gz</loc></sitemap>"
                f"<sitemap><loc>{base}/s2.xml.gz</loc></sitemap>"
                "</sitemapindex>"
            ).encode()
        )
        robots = spark.createDataFrame(
            [(
                "a.com",
                f"Sitemap: {base}/index.xml.gz\n"
                "User-agent: *\nDisallow: /private/\n",
            )],
            "domain string, robots_txt string",
        )
        ns = {
            "spark": spark,
            "robots": robots,
            "sitemap_spool_dir": str(tmp_path / "sitemaps"),
            "client": FeedHttpClient(retries=1),
        }
        exec(compile(m.group(1), "README.md#frontier", "exec"), ns)  # noqa: S102
        frontier = {r.url for r in ns["frontier"].collect()}
        # the /private/ page is discovered but robots-filtered away
        assert frontier == {"https://a.com/keep/1", "https://a.com/keep/3"}
        assert len(ns["children"]) == 2
    finally:
        srv.shutdown()


def _index_recipe_block() -> str:
    text = open("/root/repo/README.md", encoding="utf-8").read()
    section = text.split("## The index-building recipe", 1)[1]
    m = re.search(r"```python\n(.*?)```", section, re.DOTALL)
    assert m, "README index-building recipe block missing"
    return m.group(1)


def test_readme_index_building_recipe_runs_verbatim(spark, tmp_path):
    """The round-13 seam as ONE documented pipeline, executed verbatim
    against a hermetic localhost archive host: raw un-indexed archives
    -> built CDX index (header-only, redirect targets, interoperable
    digests) -> chain-resolved fetch-once selection -> throttled
    coalesced ranged reads -> parsed documents. Only final targets
    ever cost bytes; the redirect links survive as a frame."""
    import threading
    from http.server import ThreadingHTTPServer

    from tests.test_range_fetch import _ArchiveHandler

    from nextbus2pg_spark.sources.warc import warc_write_records

    def resp200(i, body):
        return {
            "type": "response",
            "uri": f"https://h{i % 2}.example.org/p/{i}",
            "date": "2026-02-01T00:00:00Z",
            "record_id": f"urn:ix:{i}",
            "block": (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
                b"Content-Length: " + str(len(body)).encode()
                + b"\r\n\r\n" + body
            ),
        }

    def redirect(i, status_line, target):
        return {
            "type": "response",
            "uri": f"https://h{i % 2}.example.org/p/{i}",
            "date": "2026-02-01T00:00:00Z",
            "record_id": f"urn:ix:{i}",
            "block": (
                b"HTTP/1.1 " + status_line + b"\r\nLocation: "
                + target.encode() + b"\r\nContent-Length: 0\r\n\r\n"
            ),
        }

    p = {i: f"https://h{i % 2}.example.org/p/{i}" for i in range(6)}
    body0 = b"final page zero body " * 3
    body3 = b"final page three body " * 3
    blob_gz = warc_write_records(
        [
            resp200(0, body0),
            redirect(1, b"301 Moved Permanently", p[0]),
            redirect(2, b"302 Found", p[1]),
        ],
        gzip_members=True,
    )
    blob_plain = warc_write_records(
        [
            resp200(3, body3),
            redirect(4, b"308 Permanent Redirect", p[3]),
            redirect(5, b"301 Moved Permanently", p[5]),  # self-loop
        ]
    )
    drop = tmp_path / "drop"
    (drop / "seg").mkdir(parents=True)
    (drop / "seg" / "a.warc.gz").write_bytes(blob_gz)
    (drop / "b.warc").write_bytes(blob_plain)

    _ArchiveHandler.files = {
        "seg/a.warc.gz": blob_gz,
        "b.warc": blob_plain,
    }
    _ArchiveHandler.requests = []
    _ArchiveHandler.ignore_range = False
    _ArchiveHandler.fail_next = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ArchiveHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ns = {
            "spark": spark,
            "archive_drop_dir": str(drop),
            "archive_base_url":
                f"http://127.0.0.1:{srv.server_address[1]}",
            "spool_dir": str(tmp_path / "spool"),
            "crawl_delays": {},
        }
        exec(  # noqa: S102
            compile(_index_recipe_block(), "README.md", "exec"), ns
        )
        # redirect links: every chain resolves to its final target
        links = {
            (r.url, r.final_url, r.hops)
            for r in ns["links"].collect()
        }
        assert links == {
            (p[1], p[0], 1), (p[2], p[0], 2), (p[4], p[3], 1),
        }
        # only the two final targets were fetched and parsed; the
        # self-loop (unresolved) and the redirects cost no bytes
        got = {
            r.uri: r.content for r in ns["crawl_docs"].collect()
        }
        assert got == {
            p[0]: body0.decode(), p[3]: body3.decode(),
        }
        assert len(_ArchiveHandler.requests) == 2
        assert all(
            r and r.startswith("bytes=")
            for r in _ArchiveHandler.requests
        )
    finally:
        srv.shutdown()
