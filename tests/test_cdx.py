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
