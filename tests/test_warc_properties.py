"""Property-based tests (hypothesis) for the round-12-touched WARC
HTTP layer — pure Python, no SparkSession: the record grammar, the
TE/CE wire composition, charset-resolution totality (the ADVICE-high
crash class), and transport-only range coalescing."""

from __future__ import annotations

import gzip
import os
import tempfile
import zlib

from hypothesis import given, settings, strategies as st

from nextbus2pg_spark.sources.http_fetcher import (
    CdxRangeFetcher,
    FeedHttpClient,
)
from nextbus2pg_spark.sources.warc import (
    _resolve_charset,
    split_http_payload,
    warc_parse,
    warc_write_records,
)

blocks = st.binary(min_size=0, max_size=200)


@given(
    data=st.lists(blocks, min_size=1, max_size=6),
    gz=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_warc_roundtrip_arbitrary_blocks(data, gz):
    """ANY block bytes — including ones containing the record
    separator, WARC magic, or gzip magic — round-trip through the
    writer/parser pair in both framings (Content-Length framing,
    never delimiter scanning)."""
    recs = [
        {
            "type": "resource",
            "uri": f"https://x.example/{i}",
            "date": "2026-01-01T00:00:00Z",
            "record_id": f"urn:p:{i}",
            "block": b,
        }
        for i, b in enumerate(data)
    ]
    parsed = warc_parse(warc_write_records(recs, gzip_members=gz))
    assert [r["block"] for r in parsed] == data
    assert [r["record_id"] for r in parsed] == [
        f"urn:p:{i}" for i in range(len(data))
    ]


def _chunkify(wire: bytes, cuts: "list[int]") -> bytes:
    """Real RFC 9112 chunked framing with arbitrary chunk splits."""
    out = bytearray()
    pos = 0
    bounds = sorted({min(c, len(wire)) for c in cuts} | {len(wire)})
    for b in bounds:
        size = b - pos
        if size <= 0:
            continue
        out += format(size, "x").encode() + b"\r\n"
        out += wire[pos:b] + b"\r\n"
        pos = b
    out += b"0\r\n\r\n"
    return bytes(out)


@given(
    body=st.binary(min_size=0, max_size=300),
    ce=st.sampled_from([None, "gzip", "x-gzip", "deflate", "deflate-raw"]),
    chunked=st.booleans(),
    cuts=st.lists(st.integers(0, 300), max_size=4),
)
@settings(max_examples=80, deadline=None)
def test_http_payload_wire_composition_roundtrips(body, ce, chunked, cuts):
    """ANY body × optional Content-Encoding (gzip / x-gzip /
    zlib-deflate / raw-deflate) × optional chunked Transfer-Encoding
    with arbitrary chunk splits decodes back to the exact body, with
    the declared coding surfaced."""
    if ce in ("gzip", "x-gzip"):
        wire = gzip.compress(body)
        ce_hdr = ce
    elif ce == "deflate":
        wire = zlib.compress(body)
        ce_hdr = "deflate"
    elif ce == "deflate-raw":
        c = zlib.compressobj(wbits=-15)
        wire = c.compress(body) + c.flush()
        ce_hdr = "deflate"
    else:
        wire, ce_hdr = body, None
    headers = b""
    if ce_hdr:
        headers += b"Content-Encoding: " + ce_hdr.encode() + b"\r\n"
    if chunked:
        wire = _chunkify(wire, cuts)
        headers += b"Transfer-Encoding: chunked\r\n"
    msg = b"HTTP/1.1 200 OK\r\n" + headers + b"\r\n" + wire
    status, out, _cs, got_ce, _loc = split_http_payload(msg)
    assert status == "HTTP/1.1 200 OK"
    assert out == body
    assert got_ce == ce_hdr


@given(label=st.text(max_size=24))
@settings(max_examples=200, deadline=None)
def test_resolve_charset_total_and_decodable(label):
    """The ADVICE-high property, quantified: for EVERY label string,
    _resolve_charset either returns None or a codec that decodes
    arbitrary bytes with errors='replace' without raising — hostile
    charset declarations can never crash a task."""
    enc = _resolve_charset(label)
    probe = bytes(range(256))
    # must not raise, whatever the label resolved to
    probe.decode(enc or "utf-8", "replace")


@given(
    sizes=st.lists(st.integers(1, 50), min_size=1, max_size=10),
    keep=st.lists(st.booleans(), min_size=1, max_size=10),
    max_gap=st.integers(0, 200),
)
@settings(max_examples=40, deadline=None)
def test_fetch_coalesced_equals_per_record_slices(sizes, keep, max_gap):
    """Transport-only coalescing invariant: for ANY span layout,
    survivor subset, and max_gap, fetch_coalesced spools exactly the
    surviving captures, each file byte-identical to its blob slice —
    dropped (gap) spans never reach the spool."""
    blob = bytearray()
    captures = []
    for i, size in enumerate(sizes):
        captures.append(
            {"filename": "a.warc.gz", "offset": len(blob), "length": size}
        )
        blob += bytes((i * 7 + j) % 256 for j in range(size))
    blob = bytes(blob)
    kept = [
        c for c, k in zip(captures, keep + [False] * len(captures)) if k
    ]

    class _BlobClient(FeedHttpClient):
        def __init__(self):
            super().__init__(retries=1)
            self.calls = 0

        def get_range(self, url, offset, length):
            self.calls += 1
            return blob[offset : offset + length]

    spool = tempfile.mkdtemp(prefix="coalesce-prop-")
    try:
        client = _BlobClient()
        f = CdxRangeFetcher("http://h.example", spool, client=client)
        n = f.fetch_coalesced(kept, max_gap=max_gap)
        assert n == len(kept)
        names = f.fetched()
        assert len(names) == len(kept)
        for c in kept:
            name = f._spool_name(c["filename"], c["offset"], c["length"])
            assert name in names
            got = open(os.path.join(spool, name), "rb").read()
            assert got == blob[c["offset"] : c["offset"] + c["length"]]
        assert client.calls <= max(len(kept), 1)
        # idempotent under the ledger
        assert f.fetch_coalesced(kept, max_gap=max_gap) == 0
    finally:
        import shutil

        shutil.rmtree(spool, ignore_errors=True)
