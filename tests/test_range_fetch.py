"""CDX-manifest ranged fetch (sources/http_fetcher.CdxRangeFetcher):
hermetic tests against a localhost stdlib http.server serving a real
gzip-membered WARC archive — individual records are fetched by HTTP
Range straight off the CDX index's (filename, offset, length) triples,
land atomically in a spool, and parse back through warc_documents via
the binaryFile source. Restart/resume soak mirrors test_http_fetcher:
the spool filenames are the ledger."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from nextbus2pg_spark.sources.http_fetcher import (
    CdxRangeFetcher,
    FeedHttpClient,
)
from nextbus2pg_spark.sources.warc import (
    warc_parse,
    warc_write_records,
)

ARCHIVE_PATH = "crawl-data/seg0/file1.warc.gz"


def _make_archive(n: int = 6):
    """Build a gzip-membered archive, returning (bytes, captures) —
    one (filename, offset, length) capture per member, exactly what a
    CDX index records."""
    blob = bytearray()
    captures = []
    for i in range(n):
        member = warc_write_records(
            [{
                "type": "conversion",
                "uri": f"https://x.example/page/{i}",
                "date": "2026-01-01T00:00:00Z",
                "record_id": f"urn:rec:{i}",
                "block": (f"record {i} content " * (i + 1)).encode(),
            }],
            gzip_members=True,
        )
        captures.append(
            {"filename": ARCHIVE_PATH, "offset": len(blob),
             "length": len(member)}
        )
        blob += member
    return bytes(blob), captures


class _ArchiveHandler(BaseHTTPRequestHandler):
    files: "dict[str, bytes]" = {}
    requests: "list[str | None]" = []  # Range header per request
    ignore_range = False
    fail_next = 0
    truncate_to = 0  # if >0, 206 bodies are cut to this many bytes

    def do_GET(self):  # noqa: N802 - http.server API
        cls = type(self)
        cls.requests.append(self.headers.get("Range"))
        if cls.fail_next > 0:
            cls.fail_next -= 1
            self.send_response(503)
            self.end_headers()
            return
        data = cls.files.get(self.path.lstrip("/"))
        if data is None:
            self.send_response(404)
            self.end_headers()
            return
        rng = self.headers.get("Range")
        if rng and not cls.ignore_range:
            lo, hi = rng.removeprefix("bytes=").split("-")
            lo, hi = int(lo), int(hi)
            body = data[lo : hi + 1]
            if cls.truncate_to:
                body = body[: cls.truncate_to]
            self.send_response(206)
            self.send_header(
                "Content-Range", f"bytes {lo}-{hi}/{len(data)}"
            )
        else:
            body = data
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture()
def archive_server():
    _ArchiveHandler.files = {}
    _ArchiveHandler.requests = []
    _ArchiveHandler.ignore_range = False
    _ArchiveHandler.fail_next = 0
    _ArchiveHandler.truncate_to = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ArchiveHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_index_first_pipeline_ends_in_record_bytes(
    archive_server, tmp_path, spark
):
    """The full index-first story: CDXJ lines → cdx_records → collect
    the (filename, offset, length) triples → ranged fetch → spool →
    binaryFile → warc_documents rows matching the original records."""
    from nextbus2pg_spark.sources.cdx import cdx_records
    from nextbus2pg_spark.sources.warc import (
        warc_documents,
        warc_spool_archives,
    )

    blob, captures = _make_archive(6)
    _ArchiveHandler.files[ARCHIVE_PATH] = blob
    # real CDXJ lines for the archive's members
    lines = [
        (
            f"com,example,x)/page/{i} 2026010100000{i} "
            + json.dumps({
                "url": f"https://x.example/page/{i}",
                "mime": "text/plain", "status": "200",
                "digest": f"d{i}",
                "length": str(c["length"]),
                "offset": str(c["offset"]),
                "filename": c["filename"],
            })
        )
        for i, c in enumerate(captures)
    ]
    recs = cdx_records(
        spark.createDataFrame([(ln,) for ln in lines], "value string")
    )
    todo = [
        r.asDict()
        for r in recs.select("filename", "offset", "length").collect()
    ]
    spool = tmp_path / "spool"
    f = CdxRangeFetcher(
        archive_server, str(spool), client=FeedHttpClient(retries=1)
    )
    assert f.fetch(todo) == 6
    # every request was a ranged one (never the whole archive)
    assert all(r and r.startswith("bytes=") for r in _ArchiveHandler.requests)
    parsed = warc_documents(warc_spool_archives(spark, str(spool)))
    rows = {r.record_id: r.content for r in parsed.collect()}
    assert rows == {
        f"urn:rec:{i}": f"record {i} content " * (i + 1) for i in range(6)
    }


def test_fetch_resumes_from_spool_ledger(archive_server, tmp_path):
    """Restart soak: a fetcher that dies mid-manifest re-runs and
    fetches ONLY the missing captures (the filenames are the ledger);
    a fully-fetched manifest is a no-op with zero HTTP requests."""
    blob, captures = _make_archive(5)
    _ArchiveHandler.files[ARCHIVE_PATH] = blob
    spool = tmp_path / "spool"

    class _DiesAfter(FeedHttpClient):
        def __init__(self, n):
            super().__init__(retries=1)
            self.left = n

        def get_range(self, url, offset, length):
            if self.left <= 0:
                raise OSError("simulated crash")
            self.left -= 1
            return super().get_range(url, offset, length)

    f1 = CdxRangeFetcher(
        archive_server, str(spool), client=_DiesAfter(2)
    )
    with pytest.raises(OSError, match="simulated crash"):
        f1.fetch(captures)
    assert len(f1.fetched()) == 2  # two durable, nothing partial

    f2 = CdxRangeFetcher(
        archive_server, str(spool), client=FeedHttpClient(retries=1)
    )
    _ArchiveHandler.requests = []
    assert f2.fetch(captures) == 3  # only the missing tail
    assert len(_ArchiveHandler.requests) == 3
    assert len(f2.fetched()) == 5
    _ArchiveHandler.requests = []
    assert f2.fetch(captures) == 0  # idempotent re-run: no requests
    assert _ArchiveHandler.requests == []
    # the spooled members parse standalone
    for name in f2.fetched():
        data = (spool / name).read_bytes()
        assert len(warc_parse(data)) == 1


def test_range_ignoring_server_and_retries(archive_server, tmp_path):
    """A server that ignores Range (200 + full body) still yields the
    right slice; a transient 503 is retried with backoff."""
    blob, captures = _make_archive(3)
    _ArchiveHandler.files[ARCHIVE_PATH] = blob
    _ArchiveHandler.ignore_range = True
    client = FeedHttpClient(retries=3, backoff_s=0, sleep=lambda s: None)
    c = captures[1]
    got = client.get_range(
        f"{archive_server}/{ARCHIVE_PATH}", c["offset"], c["length"]
    )
    assert got == blob[c["offset"] : c["offset"] + c["length"]]
    assert warc_parse(got)[0]["record_id"] == "urn:rec:1"

    _ArchiveHandler.ignore_range = False
    _ArchiveHandler.fail_next = 1
    got = client.get_range(
        f"{archive_server}/{ARCHIVE_PATH}", c["offset"], c["length"]
    )
    assert warc_parse(got)[0]["record_id"] == "urn:rec:1"
    with pytest.raises(ValueError, match="invalid byte range"):
        client.get_range(f"{archive_server}/{ARCHIVE_PATH}", -1, 5)


def test_streaming_spool_picks_up_incremental_fetches(
    archive_server, tmp_path, spark
):
    """The live-ingestion loop: fetch part of the manifest, stream a
    batch, fetch the rest, stream again — the second micro-batch
    contains exactly the newly fetched records (the spool listing is
    the offset log)."""
    from nextbus2pg_spark.sources.warc import (
        warc_documents,
        warc_spool_archives_stream,
    )

    blob, captures = _make_archive(4)
    _ArchiveHandler.files[ARCHIVE_PATH] = blob
    spool = tmp_path / "spool"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    f = CdxRangeFetcher(
        archive_server, str(spool), client=FeedHttpClient(retries=1)
    )

    def drain():
        parsed = warc_documents(
            warc_spool_archives_stream(spark, str(spool))
        )
        (
            parsed.select("record_id", "content")
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
        return {
            r.record_id for r in spark.read.parquet(str(sink)).collect()
        }

    assert f.fetch(captures[:2]) == 2
    assert drain() == {"urn:rec:0", "urn:rec:1"}
    assert f.fetch(captures) == 2  # the remaining tail
    assert drain() == {f"urn:rec:{i}" for i in range(4)}


def test_coalesce_ranges_merges_adjacent_spans(
    archive_server, tmp_path, spark
):
    """Adjacent surviving records in the same archive merge into one
    Range request; a gap or a different file breaks the run; the
    merged span parses as a concatenated-member stream end-to-end."""
    from nextbus2pg_spark.sources.http_fetcher import coalesce_ranges
    from nextbus2pg_spark.sources.warc import (
        warc_documents,
        warc_spool_archives,
    )

    blob, captures = _make_archive(6)
    _ArchiveHandler.files[ARCHIVE_PATH] = blob
    # keep records 0,1,2 (adjacent), skip 3, keep 4,5 (adjacent)
    kept = [captures[i] for i in (0, 1, 2, 4, 5)]
    merged = coalesce_ranges(kept)
    assert [
        (m["offset"], m["length"]) for m in merged
    ] == [
        (captures[0]["offset"],
         sum(captures[i]["length"] for i in (0, 1, 2))),
        (captures[4]["offset"],
         captures[4]["length"] + captures[5]["length"]),
    ]
    # a different filename never merges
    other = dict(captures[3], filename="elsewhere.warc.gz")
    assert len(coalesce_ranges(kept + [other])) == 3
    # max_gap bridges the skipped record when asked to
    assert len(
        coalesce_ranges(kept, max_gap=captures[3]["length"])
    ) == 1

    spool = tmp_path / "spool"
    f = CdxRangeFetcher(
        archive_server, str(spool), client=FeedHttpClient(retries=1)
    )
    _ArchiveHandler.requests = []
    assert f.fetch(merged) == 2  # two requests for five records
    assert len(_ArchiveHandler.requests) == 2
    parsed = warc_documents(warc_spool_archives(spark, str(spool)))
    assert {r.record_id for r in parsed.collect()} == {
        f"urn:rec:{i}" for i in (0, 1, 2, 4, 5)
    }


def test_fetch_coalesced_slices_spans_back_to_records(
    archive_server, tmp_path, spark
):
    """Transport-only coalescing (round-12 ADVICE fix): gap-bridged
    spans travel as one Range request, but the spool receives the
    ORIGINAL per-record ranges — the skipped record's bytes never
    reach the spool, so the index filter is not silently undone; the
    per-record ledger still drives resume."""
    from nextbus2pg_spark.sources.warc import (
        warc_documents,
        warc_spool_archives,
    )

    blob, captures = _make_archive(6)
    _ArchiveHandler.files[ARCHIVE_PATH] = blob
    # keep records 0,1,2 and 4,5; record 3 is filtered out
    kept = [captures[i] for i in (0, 1, 2, 4, 5)]
    spool = tmp_path / "spool"
    f = CdxRangeFetcher(
        archive_server, str(spool), client=FeedHttpClient(retries=1)
    )
    _ArchiveHandler.requests = []
    # max_gap bridges record 3: ONE request for five records
    assert f.fetch_coalesced(kept, max_gap=captures[3]["length"]) == 5
    assert len(_ArchiveHandler.requests) == 1
    assert len(f.fetched()) == 5  # five per-record spool files
    parsed = warc_documents(warc_spool_archives(spark, str(spool)))
    assert {r.record_id for r in parsed.collect()} == {
        f"urn:rec:{i}" for i in (0, 1, 2, 4, 5)
    }  # urn:rec:3 spooled nowhere — the filter holds
    # each spool file is exactly its capture's bytes
    for c in kept:
        name = f._spool_name(c["filename"], c["offset"], c["length"])
        got = (spool / name).read_bytes()
        assert got == blob[c["offset"] : c["offset"] + c["length"]]

    # resume: drop one record's spool file; only its span refetches
    victim = kept[1]
    vname = f._spool_name(
        victim["filename"], victim["offset"], victim["length"]
    )
    (spool / vname).unlink()
    _ArchiveHandler.requests = []
    assert f.fetch_coalesced(kept, max_gap=captures[3]["length"]) == 1
    assert len(_ArchiveHandler.requests) == 1
    lo, hi = (
        _ArchiveHandler.requests[0].removeprefix("bytes=").split("-")
    )
    assert int(hi) - int(lo) + 1 == victim["length"]  # just the one
    assert (spool / vname).read_bytes() == blob[
        victim["offset"] : victim["offset"] + victim["length"]
    ]
    # idempotent: nothing left to do
    assert f.fetch_coalesced(kept) == 0


def test_streaming_spool_survives_kill_mid_fetch(
    archive_server, tmp_path, spark
):
    """Round-12 verdict item 7, the streaming twin's crash soak: the
    fetcher DIES mid-manifest (transport error after 2 records); the
    live stream drains exactly what was durably spooled; a restarted
    fetcher resumes from the filenames-ledger (skipping the spooled
    records, fetching only the remainder); the next micro-batch
    contains exactly the new records — no duplicates, no losses,
    across the crash."""
    from nextbus2pg_spark.sources.warc import (
        warc_documents,
        warc_spool_archives_stream,
    )

    blob, captures = _make_archive(6)
    _ArchiveHandler.files[ARCHIVE_PATH] = blob
    spool = tmp_path / "spool"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"

    class _DyingClient(FeedHttpClient):
        """Raises on the Nth request — a process kill mid-manifest."""

        def __init__(self, die_after: int):
            super().__init__(retries=1)
            self.left = die_after

        def get_range(self, url, offset, length):
            if self.left <= 0:
                raise OSError("killed mid-fetch")
            self.left -= 1
            return super().get_range(url, offset, length)

    f1 = CdxRangeFetcher(
        archive_server, str(spool), client=_DyingClient(die_after=2)
    )
    with pytest.raises(OSError, match="killed"):
        f1.fetch(captures)
    assert len(f1.fetched()) == 2  # two records landed durably

    def drain():
        parsed = warc_documents(
            warc_spool_archives_stream(spark, str(spool))
        )
        (
            parsed.select("record_id", "content")
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
        return [r.record_id for r in spark.read.parquet(str(sink)).collect()]

    got = drain()
    assert sorted(got) == ["urn:rec:0", "urn:rec:1"]

    # restart: a fresh fetcher process, healthy transport; the ledger
    # resumes — only the remaining four records are requested
    _ArchiveHandler.requests = []
    f2 = CdxRangeFetcher(
        archive_server, str(spool), client=FeedHttpClient(retries=1)
    )
    assert f2.fetch(captures) == 4
    assert len(_ArchiveHandler.requests) == 4
    got = drain()
    assert sorted(got) == [f"urn:rec:{i}" for i in range(6)]
    assert len(got) == len(set(got))  # exactly-once across the crash


def test_short_range_response_is_never_published(archive_server, tmp_path):
    """Round-12 review: a 206 shorter than the requested span
    (truncated read / stale CDX lengths past EOF) must raise BEFORE
    anything is published — a silently spooled partial record would be
    ledger-done forever. Both fetch paths refuse; the spool stays
    empty so the retry refetches cleanly."""
    blob, captures = _make_archive(4)
    _ArchiveHandler.files[ARCHIVE_PATH] = blob
    _ArchiveHandler.truncate_to = 5
    spool = tmp_path / "spool"
    f = CdxRangeFetcher(
        archive_server, str(spool), client=FeedHttpClient(retries=1)
    )
    with pytest.raises(ValueError, match="short Range response"):
        f.fetch(captures)
    assert f.fetched() == set()
    with pytest.raises(ValueError, match="short Range response"):
        f.fetch_coalesced(captures)
    assert f.fetched() == set()
    # healthy server again: the same manifest completes
    _ArchiveHandler.truncate_to = 0
    assert f.fetch_coalesced(captures) == 4


def test_overlong_names_spool_safely_and_resume(archive_server, tmp_path):
    """Round-12 review: archive filenames / sitemap URLs longer than
    the filesystem NAME limit (sitemaps.org allows 2048-char locs)
    must not ENAMETOOLONG-crash the fetcher — overlong stems cap to a
    head + sha1 digest, deterministic across restarts so the ledger
    still resumes."""
    from nextbus2pg_spark.sources.http_fetcher import (
        SitemapFetcher,
        _cap_spool_stem,
    )

    long_path = "crawl-data/" + "x" * 400 + "/file.warc.gz"
    blob, captures = _make_archive(2)
    for c in captures:
        c["filename"] = long_path
    _ArchiveHandler.files[long_path] = blob
    spool = tmp_path / "spool"
    f = CdxRangeFetcher(
        archive_server, str(spool), client=FeedHttpClient(retries=1)
    )
    assert f.fetch(captures) == 2
    assert all(len(n) <= 255 for n in f.fetched())
    assert f.fetch(captures) == 0  # ledger resume on the capped names
    # distinct long names stay collision-free (digest of the FULL value)
    other = "crawl-data/" + "x" * 399 + "y/file.warc.gz"
    a = f._spool_name(long_path, 0, 10)
    b = f._spool_name(other, 0, 10)
    assert a != b and len(a) <= 255 and len(b) <= 255
    # no %XX escape is cut mid-sequence (keeps names url-decodable)
    capped = _cap_spool_stem("ab%2F" * 100)
    assert "--sha1-" in capped
    head = capped.split("--sha1-")[0]
    assert not head.endswith("%") and not head[-2:-1] == "%"

    # the sitemap fetcher shares the cap
    long_url = f"{archive_server}/s/" + "y" * 1900 + ".xml.gz"
    sf = SitemapFetcher(str(tmp_path / "maps"),
                        client=FeedHttpClient(retries=1))
    name = sf.spool_name(long_url)
    assert len(name) <= 255 and name.endswith(".sitemap")


def test_fetch_coalesced_guards_and_span_cap(archive_server, tmp_path):
    """Round-12 review: negative max_gap raises (parity with
    coalesce_ranges), and max_span_bytes splits runs so a merged span
    never materializes more than the cap in memory."""
    blob, captures = _make_archive(6)
    _ArchiveHandler.files[ARCHIVE_PATH] = blob
    spool = tmp_path / "spool"
    f = CdxRangeFetcher(
        archive_server, str(spool), client=FeedHttpClient(retries=1)
    )
    with pytest.raises(ValueError, match="max_gap"):
        f.fetch_coalesced(captures, max_gap=-1)
    with pytest.raises(ValueError, match="max_span_bytes"):
        f.fetch_coalesced(captures, max_span_bytes=0)
    cap = captures[0]["length"] + captures[1]["length"]
    _ArchiveHandler.requests = []
    assert f.fetch_coalesced(captures, max_span_bytes=cap) == 6
    # every request stayed within the cap; all six records landed
    for r in _ArchiveHandler.requests:
        lo, hi = r.removeprefix("bytes=").split("-")
        assert int(hi) - int(lo) + 1 <= cap
    assert len(_ArchiveHandler.requests) >= 3
