"""CDX(J) index source (sources/cdx.py): SURT keys, typed parse with
malformed-line quarantine, digest dedup, and the archive manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from nextbus2pg_spark.sources.cdx import (
    cdx_archive_manifest,
    cdx_records,
    surt_key,
)


def test_surt_key(spark):
    rows = spark.createDataFrame(
        [
            ("https://www.Ex.com/a/b",),
            ("http://sub.host.ORG/",),
            ("https://plain.net",),  # no path → '/'
        ],
        "url string",
    ).select(surt_key(F.col("url")).alias("k"))
    assert [r.k for r in rows.collect()] == [
        "com,ex,www)/a/b",
        "org,host,sub)/",
        "net,plain)/",
    ]


def _line(surt, ts, **j):
    import json

    return f"{surt} {ts} {json.dumps(j)}"


def test_cdx_records_types_and_quarantine(spark):
    good = _line(
        "com,ex)/p", "20260101120000",
        url="https://ex.com/p", mime="text/html", status="200",
        digest="d1", length="123", offset="4567",
        filename="crawl-000.warc.gz",
    )
    bad = "com,bad)/x 20260101120000 {not json"
    df = cdx_records(
        spark.createDataFrame([(good,), (bad,)], "value string")
    )
    rows = {r.surt: r for r in df.collect()}
    g = rows["com,ex)/p"]
    assert (g.status, g.length, g.offset) == (200, 123, 4567)
    assert g.capture_ts is not None
    b = rows["com,bad)/x"]
    assert b.url is None  # malformed JSON → NULL fields, row survives


def test_manifest_filters_and_digest_dedup(spark):
    mk = lambda i, status, mime, digest, off, fn: _line(
        f"com,s{i})/", "20260101120000",
        url=f"https://s{i}.com/", mime=mime, status=status,
        digest=digest, length="100", offset=str(off), filename=fn,
    )
    lines = [
        mk(0, "200", "text/html", "dA", 1000, "a.warc.gz"),
        mk(1, "200", "text/plain", "dA", 2000, "b.warc.gz"),  # dup digest
        mk(2, "404", "text/html", "dB", 3000, "a.warc.gz"),  # status out
        mk(3, "200", "image/png", "dC", 4000, "a.warc.gz"),  # mime out
        mk(4, "200", "text/html", "dD", 5000, "b.warc.gz"),
    ]
    df = cdx_records(
        spark.createDataFrame([(x,) for x in lines], "value string")
    )
    m = {
        r.filename: r
        for r in cdx_archive_manifest(df).collect()
    }
    # dA kept once (min offset 1000 → a.warc.gz); dD in b.warc.gz
    assert m["a.warc.gz"].n_records == 1
    assert m["a.warc.gz"].min_offset == 1000
    assert m["b.warc.gz"].n_records == 1
    assert m["b.warc.gz"].min_offset == 5000
    assert set(m) == {"a.warc.gz", "b.warc.gz"}
    # dedup off: both dA captures survive
    m2 = {
        r.filename: r
        for r in cdx_archive_manifest(df, dedup_digest=False).collect()
    }
    assert m2["b.warc.gz"].n_records == 2


def test_cdx_delta_statuses_and_best_capture_collapse(spark):
    """Digest-keyed crawl diff: added/removed/moved/retained, with the
    per-side best-capture collapse (a digest stored twice in the new
    crawl classifies once, via its min-(offset,filename) capture)."""
    from nextbus2pg_spark.sources.cdx import cdx_delta

    schema = "digest string, url string, offset long, filename string"
    old = spark.createDataFrame(
        [
            ("dA", "https://a/1", 100, "o.warc.gz"),
            ("dB", "https://b/1", 200, "o.warc.gz"),
            ("dC", "https://c/1", 300, "o.warc.gz"),
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            ("dA", "https://a/1", 110, "n.warc.gz"),  # retained
            ("dC", "https://c/MOVED", 310, "n.warc.gz"),  # moved
            ("dD", "https://d/1", 900, "n.warc.gz"),  # added, dup below
            ("dD", "https://d/0", 400, "m.warc.gz"),  # min wins
        ],
        schema,
    )
    out = {r.digest: r for r in cdx_delta(old, new).collect()}
    assert out["dA"].status == "retained"
    assert out["dB"].status == "removed"
    assert out["dB"].new_url is None
    assert out["dC"].status == "moved"
    assert out["dC"].new_url == "https://c/MOVED"
    assert out["dD"].status == "added"
    assert (out["dD"].new_offset, out["dD"].new_filename) == (
        400, "m.warc.gz",
    )
    assert len(out) == 4


def _mixed_archives():
    """One gzip-membered (CC framing) and one plain archive, plus the
    raw blobs for slice verification."""
    import gzip as _gzip

    from nextbus2pg_spark.sources.warc import warc_write_records

    def resp(i, body, extra=b""):
        return {
            "type": "response",
            "uri": f"https://h{i % 2}.example.org/p/{i}",
            "date": "2026-03-01T00:00:00Z",
            "record_id": f"urn:ix:{i}",
            "block": (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                b"charset=utf-8\r\n" + extra + b"Content-Length: "
                + str(len(body)).encode() + b"\r\n\r\n" + body
            ),
        }

    recs_gz = [resp(i, f"page {i} body ".encode() * (i + 1))
               for i in range(4)]
    # an undecodable coding must still be indexable (no body decode)
    recs_gz.append(dict(
        resp(4, b"\x0b\x02\x80brotli-ish",
             extra=b"Content-Encoding: br\r\n"),
    ))
    recs_plain = [resp(10 + i, f"plain {i} ".encode() * 5)
                  for i in range(3)] + [{
        "type": "conversion",
        "uri": "https://h0.example.org/wet/1",
        "date": "2026-03-01T00:00:00Z",
        "record_id": "urn:ix:wet",
        "payload_digest": "md5:DECLARED",
        "block": b"already extracted text",
    }]
    blob_gz = warc_write_records(recs_gz, gzip_members=True)
    blob_plain = warc_write_records(recs_plain)
    # plus one DOUBLE-record gzip member appended to the gz archive:
    # spans for both records must be the member's (coarse, parseable)
    two = warc_write_records([
        resp(90, b"first of member"), resp(91, b"second of member"),
    ])
    blob_gz2 = blob_gz + _gzip.compress(two, 6)
    return blob_gz2, blob_plain


def test_build_cdx_index_round_trips_spans(spark):
    """build_cdx_index (round 12): archives -> typed captures whose
    (offset, length) spans slice back out of the raw blob and re-parse
    to exactly the indexed record — gzip-member spans for the CC
    framing, record byte ranges for plain framing, member-coarse spans
    for a multi-record member; status/mime parse headers only (the br
    response indexes fine); declared digests win, others get the
    CC-interoperable sha1:<base32> of the PAYLOAD (round 13)."""
    import base64
    import hashlib

    from nextbus2pg_spark.sources.cdx import build_cdx_index
    from nextbus2pg_spark.sources.warc import warc_parse

    blob_gz, blob_plain = _mixed_archives()
    blobs = {"seg/gz.warc.gz": blob_gz, "seg/plain.warc": blob_plain}
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()],
        "filename string, payload binary",
    )
    rows = build_cdx_index(df).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r)
    assert len(rows) == 5 + 4 + 2  # gz + plain + the double member

    for r in rows:
        # every span slices back to a stream containing its record
        blob = blobs[r.filename]
        sliced = warc_parse(blob[r.offset : r.offset + r.length])
        ids = [x["record_id"] for x in sliced]
        assert any(
            x["uri"] == r.url for x in sliced
        ), (r.url, ids)
        if r.url not in (
            "https://h0.example.org/p/90",
            "https://h1.example.org/p/91",
        ):
            assert len(sliced) == 1  # one record per span
        # digest: declared wins, else sha1:base32 of the PAYLOAD (the
        # HTTP body for responses — exactly what a WARC-Payload-Digest
        # header would carry, so built and shipped indexes dedup
        # against each other)
        rec = next(x for x in sliced if x["uri"] == r.url)
        block = rec["block"]
        sep = block.find(b"\r\n\r\n")
        payload = (
            block[sep + 4 :]
            if block[:5] == b"HTTP/" and sep >= 0
            else block
        )
        want = rec["payload_digest"] or (
            "sha1:"
            + base64.b32encode(
                hashlib.sha1(payload).digest()
            ).decode("ascii")
        )
        assert r.digest == want

    # the multi-record member: both rows share the coarse member span
    a = by_url["https://h0.example.org/p/90"][0]
    b = by_url["https://h1.example.org/p/91"][0]
    assert (a.offset, a.length) == (b.offset, b.length)
    assert len(warc_parse(blob_gz[a.offset : a.offset + a.length])) == 2

    # header-only metadata: status/mime everywhere, incl. the br row;
    # the WET row has NULLs and its declared digest
    br = by_url["https://h0.example.org/p/4"][0]
    assert (br.status, br.mime) == (200, "text/html")
    wet = by_url["https://h0.example.org/wet/1"][0]
    assert wet.status is None and wet.mime is None
    assert wet.digest == "md5:DECLARED"
    # surts + timestamps landed
    assert all(r.surt.startswith("org,example,h") for r in rows)
    assert all(r.capture_ts is not None for r in rows)


def test_build_cdx_index_composes_with_manifest_and_fetch(spark, tmp_path):
    """The full inverse loop: archives WITHOUT an index -> built index
    -> manifest filters -> captures -> slice fetch -> parsed documents
    == the filtered originals (the round-trip that makes index-first
    selection available to raw archive drops)."""
    from nextbus2pg_spark.sources.cdx import (
        build_cdx_index,
        cdx_archive_manifest,
    )
    from nextbus2pg_spark.sources.warc import warc_parse

    blob_gz, blob_plain = _mixed_archives()
    blobs = {"seg/gz.warc.gz": blob_gz, "seg/plain.warc": blob_plain}
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()],
        "filename string, payload binary",
    )
    index = build_cdx_index(df)
    kept = index.where(
        (F.col("status") == 200) & F.col("mime").startswith("text/")
    )
    manifest = cdx_archive_manifest(index).collect()
    assert {m.filename for m in manifest} == set(blobs)
    got = set()
    for c in kept.collect():
        blob = blobs[c.filename]
        for rec in warc_parse(blob[c.offset : c.offset + c.length]):
            if rec["uri"] == c.url:
                got.add(rec["record_id"])
    assert got == {f"urn:ix:{i}" for i in (0, 1, 2, 3, 4, 10, 11, 12)} | {
        "urn:ix:90", "urn:ix:91",
    }


def test_build_cdx_index_quarantines_bad_archives(spark):
    """on_error='null' -> one NULL-url row per garbage archive (the
    downstream 'WHERE url IS NOT NULL' contract); 'raise' raises."""
    import pytest as _pytest

    from nextbus2pg_spark.sources.cdx import build_cdx_index

    _, blob_plain = _mixed_archives()
    df = spark.createDataFrame(
        [("ok.warc", bytearray(blob_plain)),
         ("bad.warc", bytearray(b"not a warc"))],
        "filename string, payload binary",
    )
    rows = build_cdx_index(df, on_error="null").collect()
    bad = [r for r in rows if r.filename == "bad.warc"]
    assert len(bad) == 1 and bad[0].url is None
    assert len([r for r in rows if r.url is not None]) == 4
    with _pytest.raises(Exception):
        build_cdx_index(df, on_error="raise").collect()


def test_build_cdx_index_retracts_partial_rows_on_midstream_failure(
    spark,
):
    """Round-12 ADVICE (medium): an archive whose record walk fails
    MID-stream (truncated last record after N good ones) must
    contribute EXACTLY one NULL-url quarantine row — never its partial
    survivors next to the marker (downstream 'url IS NOT NULL'
    filtering would keep a silently incomplete index)."""
    import pytest as _pytest

    from nextbus2pg_spark.sources.cdx import build_cdx_index

    _, blob_plain = _mixed_archives()
    truncated = blob_plain[: len(blob_plain) - 10]  # cuts the last
    # record's block: earlier records parse fine, then ValueError
    df = spark.createDataFrame(
        [("ok.warc", bytearray(blob_plain)),
         ("trunc.warc", bytearray(truncated))],
        "filename string, payload binary",
    )
    rows = build_cdx_index(df, on_error="null").collect()
    trunc = [r for r in rows if r.filename == "trunc.warc"]
    assert len(trunc) == 1 and trunc[0].url is None
    assert len([r for r in rows if r.filename == "ok.warc"]) == 4
    with _pytest.raises(Exception):
        build_cdx_index(df, on_error="raise").collect()


def test_build_cdx_index_empty_payload_quarantines_in_both_modes(spark):
    """The documented carve-out (round-13 verdict item 3): NULL/empty
    payloads route to the quarantine row in BOTH error modes — they
    carry no framing to be strict about (the repo-wide decoder
    convention)."""
    from nextbus2pg_spark.sources.cdx import build_cdx_index

    df = spark.createDataFrame(
        [("empty.warc", bytearray(b"")), ("null.warc", None)],
        "filename string, payload binary",
    )
    for mode in ("null", "raise"):
        rows = build_cdx_index(df, on_error=mode).collect()
        assert sorted(r.filename for r in rows) == [
            "empty.warc", "null.warc",
        ]
        assert all(r.url is None for r in rows)


def test_build_cdx_index_digest_interop_with_declared_digests(spark):
    """Round-13 verdict item 2: the builder's fallback digest equals
    the WARC-Payload-Digest a shipped archive declares for the same
    payload (sha1:<base32> of the body), so digest-dedup collapses
    captures ACROSS provenances — and the exact digest string matches
    an independently computed vector."""
    import base64
    import hashlib

    from nextbus2pg_spark.sources.cdx import (
        build_cdx_index,
        cdx_archive_manifest,
    )
    from nextbus2pg_spark.sources.warc import synthetic_digest_archives

    docs = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(8)],
        "doc_id long, text string",
    )
    index = build_cdx_index(synthetic_digest_archives(docs, 2))
    rows = index.collect()
    assert len(rows) == 16  # every doc captured twice
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.url, set()).add(r.digest)
    # the declared and the computed digest agree per payload...
    assert all(len(v) == 1 for v in by_doc.values())
    want = "sha1:" + base64.b32encode(
        hashlib.sha1(b"document body 3").digest()
    ).decode("ascii")
    assert by_doc["https://example.org/doc/3"] == {want}
    # ...so cross-provenance digest-dedup keeps ONE fetch per payload
    m = cdx_archive_manifest(index, mime_prefixes=("text/",))
    assert sum(r.n_records for r in m.collect()) == 8


def _redirect_records(spark):
    """A CDX snapshot with redirect chains: a->b->c (200), a 308 d->c,
    a self-contained loop x<->y, and a redirect to an uncaptured URL."""
    schema = (
        "url string, status int, redirect string, mime string, "
        "digest string, length long, offset long, filename string"
    )
    rows = [
        ("https://s/a", 301, "https://s/b", None, "dA", 100, 0, "f.gz"),
        ("https://s/b", 302, "https://s/c", None, "dB", 100, 100, "f.gz"),
        ("https://s/c", 200, None, "text/html", "dC", 500, 200, "f.gz"),
        ("https://s/d", 308, "https://s/c", None, "dD", 100, 700, "f.gz"),
        ("https://s/x", 301, "https://s/y", None, "dX", 100, 800, "f.gz"),
        ("https://s/y", 301, "https://s/x", None, "dY", 100, 900, "f.gz"),
        ("https://s/gone", 301, "https://off.site/z", None, "dG", 100,
         1000, "f.gz"),
    ]
    return spark.createDataFrame(rows, schema)


def test_cdx_resolve_redirects_chains_loops_and_tails(spark):
    from nextbus2pg_spark.sources.cdx import cdx_resolve_redirects

    out = {
        r.url: r
        for r in cdx_resolve_redirects(_redirect_records(spark)).collect()
    }
    assert (out["https://s/a"].final_url, out["https://s/a"].hops) == (
        "https://s/c", 2,
    )
    assert out["https://s/b"].final_url == "https://s/c"
    assert out["https://s/b"].hops == 1
    # non-redirects map to themselves
    assert (out["https://s/c"].final_url, out["https://s/c"].hops) == (
        "https://s/c", 0,
    )
    assert out["https://s/c"].resolved
    assert out["https://s/d"].final_url == "https://s/c"
    # loops exhaust the hop budget and stay unresolved
    assert not out["https://s/x"].resolved
    assert not out["https://s/y"].resolved
    # a chain ending at an uncaptured URL still resolves (frontier's
    # call whether to fetch it)
    g = out["https://s/gone"]
    assert (g.final_url, g.resolved) == ("https://off.site/z", True)
    assert all(
        r.hops <= 4 for r in out.values()
    )


def test_cdx_fetch_once_manifest_one_fetch_per_chain(spark):
    """The fetch-once rule: a 301->302->200 chain plus a second
    redirect into the same target cost ONE fetch — the 200 capture's
    bytes; redirect captures and loop members are never fetched."""
    from nextbus2pg_spark.sources.cdx import cdx_fetch_once_manifest

    m = cdx_fetch_once_manifest(_redirect_records(spark)).collect()
    assert len(m) == 1
    assert (m[0].filename, m[0].n_records, m[0].total_bytes) == (
        "f.gz", 1, 500,
    )
    assert (m[0].min_offset, m[0].max_offset) == (200, 200)


def test_fetch_once_narrow_targets_match_corpus_join(spark):
    """Round-13 optimization pin: cdx_fetch_once_manifest builds its
    target set WITHOUT the corpus-wide cdx_resolve_redirects join
    (chain finals ∪ non-source captures, a url-only anti-join). This
    differential replays the pre-optimization formulation — distinct
    resolved final_url over the full resolved frame — and the two
    manifests must be row-identical on a fixture that exercises every
    class: multi-hop chains, a shared target, an unresolved loop, and
    a chain into an uncaptured URL."""
    from nextbus2pg_spark.sources.cdx import (
        cdx_archive_manifest,
        cdx_fetch_once_manifest,
        cdx_resolve_redirects,
    )

    records = _redirect_records(spark)
    resolved = cdx_resolve_redirects(records)
    targets = (
        resolved.where("resolved").selectExpr("final_url AS __t").distinct()
    )
    finals = records.join(
        targets, records["url"] == targets["__t"], "left_semi"
    )
    want = sorted(map(tuple, cdx_archive_manifest(finals).collect()))
    got = sorted(map(tuple, cdx_fetch_once_manifest(records).collect()))
    assert got == want
