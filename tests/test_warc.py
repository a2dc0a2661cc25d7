"""WARC source (sources/warc.py): record grammar round trips in both
framings (plain + Common Crawl gzip members), HTTP response splitting,
malformed-framing raises, and the archive→records Spark fanout with
the quarantine contract."""

from __future__ import annotations

import gzip

import pytest

from nextbus2pg_spark.sources.warc import (
    split_http_payload,
    warc_parse,
    warc_write_records,
)


def _recs(n=3, http_every=0):
    out = []
    for i in range(n):
        body = f"document {i} body ü{i}".encode()
        if http_every and i % http_every == 0:
            block = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
                + body
            )
            rtype = "response"
        else:
            block, rtype = body, "conversion"
        out.append(
            {
                "type": rtype,
                "uri": f"https://x.example/{i}",
                "date": "2026-01-01T00:00:00Z",
                "record_id": f"urn:r:{i}",
                "block": block,
            }
        )
    return out


@pytest.mark.parametrize("gz", [False, True])
def test_round_trip_both_framings(gz):
    recs = _recs(5, http_every=2)
    parsed = warc_parse(warc_write_records(recs, gzip_members=gz))
    assert [
        (r["type"], r["uri"], r["record_id"], r["block"]) for r in parsed
    ] == [(r["type"], r["uri"], r["record_id"], r["block"]) for r in recs]


def test_binary_blocks_with_embedded_crlf_survive():
    """Content-Length framing, not delimiter scanning: blocks that
    CONTAIN the record separator bytes must round-trip intact."""
    evil = b"\r\n\r\nWARC/1.0\r\n\r\n" + bytes(range(256))
    recs = [{
        "type": "resource", "uri": "u", "date": "d",
        "record_id": "r", "block": evil,
    }]
    assert warc_parse(warc_write_records(recs))[0]["block"] == evil


def test_http_split():
    status, body = split_http_payload(
        b"HTTP/1.1 404 Not Found\r\nX: y\r\n\r\npayload"
    )
    assert status == "HTTP/1.1 404 Not Found" and body == b"payload"
    status, body = split_http_payload(b"plain WET content")
    assert status == "" and body == b"plain WET content"
    with pytest.raises(ValueError, match="HTTP headers"):
        split_http_payload(b"HTTP/1.1 200 OK\r\nnever-terminated")


def test_malformed_framing_raises():
    good = warc_write_records(_recs(2))
    with pytest.raises(ValueError, match="truncated"):
        warc_parse(good[:-12])
    with pytest.raises(ValueError, match="not a WARC record"):
        warc_parse(b"HTTP/1.1 200 OK\r\n\r\nnope")
    no_len = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n\r\nbody\r\n\r\n"
    )
    with pytest.raises(ValueError, match="Content-Length"):
        warc_parse(no_len)
    # gzip magic but corrupt stream surfaces as a loud error too
    with pytest.raises(Exception):
        warc_parse(b"\x1f\x8bgarbage")


def test_gzip_members_are_independent():
    """The CC convention: each record its own member — a stream cut at
    a member boundary still parses the preceding records."""
    recs = _recs(3)
    gz_each = [
        warc_write_records([r], gzip_members=True) for r in recs
    ]
    two = warc_parse(gz_each[0] + gz_each[1])
    assert [r["record_id"] for r in two] == ["urn:r:0", "urn:r:1"]
    # sanity: members really are separate gzip streams
    assert gzip.decompress(gz_each[0]) != gzip.decompress(
        gz_each[0] + gz_each[1]
    )


def test_warc_documents_fanout_and_quarantine(spark):
    from nextbus2pg_spark.sources.warc import warc_documents

    good = warc_write_records(_recs(4, http_every=2), gzip_members=True)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a warc at all"))],
        "archive_id long, payload binary",
    )
    rows = warc_documents(df, on_error="null").collect()
    ok = [r for r in rows if r.archive_id == 1]
    bad = [r for r in rows if r.archive_id == 2]
    assert len(ok) == 4 and all(r.parse_error is None for r in ok)
    assert {r.warc_type for r in ok} == {"response", "conversion"}
    assert all(
        (r.http_status == "HTTP/1.1 200 OK") == (r.warc_type == "response")
        for r in ok
    )
    assert len(bad) == 1 and bad[0].parse_error
    with pytest.raises(Exception):
        warc_documents(df, on_error="raise").collect()
