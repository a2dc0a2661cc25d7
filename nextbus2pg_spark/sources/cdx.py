"""Common Crawl CDX(J) index source.

A real Common Crawl ingestion never starts from the WARC archives —
it starts from the CDX index (the `cc-index` CDXJ files): one line per
capture, ``<SURT key> <14-digit timestamp> <JSON>`` where the JSON
carries ``url``, ``mime``, ``status``, ``digest``, ``length``,
``offset``, ``filename`` (the WARC member's byte range). The pipeline
filters captures (status, mime, dedup by digest) and reduces to an
ARCHIVE MANIFEST — which WARC files to fetch and how many bytes of
each — before a single archive byte moves. At 100 TB this index-first
shape is the difference between reading ~1% of the crawl and all of
it. The manifest's executor is ``sources/http_fetcher.
CdxRangeFetcher`` (round-11): each filtered capture becomes one HTTP
``Range`` read landing in a spool that ``sources/warc.
warc_spool_archives`` turns back into record bytes.

Everything here is JVM-side DataFrame expressions (split/from_json/
aggregates) — no Python in the hot path; CDX files gzip-split fine
under ``spark.read.text`` since they are line-oriented.

Parity citation: the reference has no index surface (single XML feed,
reference README); this is extension surface for the crawl-ingestion
seam (sources/warc.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: JSON payload schema of a CDXJ line (the cc-index field set).
CDX_JSON_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of a URL —
    the CDX sort key: scheme dropped, host lowercased and reversed
    comma-wise, then ``)`` and the path. ``https://www.Ex.com/a/b`` →
    ``com,ex,www)/a/b``. Pure JVM expressions (one regexp per part).
    """
    host = F.lower(F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/]+)", 1))
    path = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/]+(/.*)?$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev, F.lit(")"), F.when(path == "", "/").otherwise(path))


def cdx_records(lines: DataFrame, col: str = "value") -> DataFrame:
    """Parse CDXJ lines → one typed row per capture: ``(surt,
    capture_ts, url, mime, status int, digest, length long,
    offset long, filename)``.

    The numeric fields arrive as JSON STRINGS in real cc-index files
    (the published format quotes them) — cast after parse. Malformed
    JSON yields NULL fields (from_json's contract), so a downstream
    ``WHERE url IS NOT NULL`` quarantines bad lines without killing
    the scan.
    """
    parts = F.split(F.col(col), " ", 3)
    j = F.from_json(parts[2], CDX_JSON_SCHEMA)
    return lines.select(
        parts[0].alias("surt"),
        F.to_timestamp(parts[1], "yyyyMMddHHmmss").alias("capture_ts"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["length"].cast("long").alias("length"),
        j["offset"].cast("long").alias("offset"),
        j["filename"].alias("filename"),
    )


def cdx_archive_manifest(
    records: DataFrame,
    statuses: "tuple[int, ...]" = (200,),
    mime_prefixes: "tuple[str, ...]" = ("text/",),
    dedup_digest: bool = True,
) -> DataFrame:
    """Reduce filtered captures to the fetch manifest: one row per
    WARC file with the records to read — ``(filename, n_records,
    total_bytes, min_offset, max_offset)``.

    ``dedup_digest`` keeps one capture per content digest (the
    CC-recommended fetch dedup: identical payloads are stored many
    times across the crawl) — min (offset, filename) wins,
    deterministic. Filters are pushable predicates; the digest dedup
    is one aggregate; the manifest is another — two shuffles total,
    both on bounded keys, nothing per-byte.
    """
    from functools import reduce

    mime_pred = reduce(
        lambda a, b: a | b,
        [F.col("mime").startswith(p) for p in mime_prefixes],
    )
    kept = records.where(
        F.col("status").isin(list(statuses)) & mime_pred
    )
    if dedup_digest:
        best = kept.groupBy("digest").agg(
            F.min(F.struct("offset", "filename")).alias("__w")
        )
        kept = kept.join(
            best,
            (kept["digest"] == best["digest"])
            & (kept["offset"] == best["__w"]["offset"])
            & (kept["filename"] == best["__w"]["filename"]),
            "left_semi",
        )
    return kept.groupBy("filename").agg(
        F.count("*").cast("long").alias("n_records"),
        F.sum("length").cast("long").alias("total_bytes"),
        F.min("offset").alias("min_offset"),
        F.max("offset").alias("max_offset"),
    )


def cdx_delta(
    old: DataFrame,
    new: DataFrame,
) -> DataFrame:
    """Incremental crawl diff between two CDX snapshots, keyed by
    content digest → one row per digest with ``status``:

    - ``added``    — digest only in the new crawl (fetch it);
    - ``removed``  — digest only in the old crawl (tombstone it);
    - ``moved``    — digest in both but its best capture URL changed
      (refresh provenance, skip the bytes);
    - ``retained`` — digest and URL unchanged (skip entirely).

    The recurring-ingest primitive: a monthly 100 TB crawl is mostly
    ``retained``, and this one full-outer equi-join on digest is what
    keeps the pipeline's fetch volume proportional to the CHANGE, not
    the crawl. Each side first collapses to its best capture per
    digest (min (offset, filename) — the manifest's dedup rule), so
    the join keys are unique and the shuffle is digest-bounded.
    """

    def best(records: DataFrame, side: str) -> DataFrame:
        return records.groupBy("digest").agg(
            F.min(F.struct("offset", "filename", "url")).alias("__w")
        ).select(
            "digest",
            F.col("__w")["url"].alias(f"{side}_url"),
            F.col("__w")["filename"].alias(f"{side}_filename"),
            F.col("__w")["offset"].alias(f"{side}_offset"),
        )

    joined = best(old, "old").join(best(new, "new"), "digest", "full_outer")
    status = (
        F.when(F.col("old_url").isNull(), "added")
        .when(F.col("new_url").isNull(), "removed")
        .when(F.col("old_url") != F.col("new_url"), "moved")
        .otherwise("retained")
    )
    return joined.select(
        "digest",
        status.alias("status"),
        "old_url",
        "new_url",
        "new_filename",
        "new_offset",
    )


#: Arrow-stage output of :func:`build_cdx_index` before the JVM-side
#: surt/timestamp derivation.
_BUILD_SCHEMA = (
    "url string, warc_date string, mime string, status int, "
    "digest string, length long, offset long, filename string"
)


def build_cdx_index(
    archives: DataFrame,
    on_error: str = "raise",
) -> DataFrame:
    """The INVERSE of :func:`cdx_records` — derive a typed CDX index
    from raw WARC archives, one capture row per record with the byte
    span a Range request refetches it by (round 12; the operation
    Common Crawl's own indexer performs). Input: ``(filename string,
    payload binary)``; output: the exact :func:`cdx_records` column
    set ``(surt, capture_ts, url, mime, status, digest, length,
    offset, filename)``, so ``cdx_archive_manifest`` / ``cdx_delta`` /
    ``CdxRangeFetcher`` compose on it unchanged — archives that
    shipped WITHOUT an index join the index-first path.

    Per record: ``offset``/``length`` are the COMPRESSED gzip-member
    span for CC-framed archives (plain archives: the record's own
    byte range — both slice back through ``warc_iter_records``);
    ``status``/``mime`` parse from the HTTP head WITHOUT decoding the
    body (undecodable Content-Encoding is indexable — CC indexes br
    responses too); ``digest`` is the record's declared
    WARC-Payload-Digest, else ``md5:<hex>`` of the raw block (self-
    consistent for digest-dedup and ``cdx_delta`` within indexes this
    builder produced). Non-response records carry NULL status/mime.

    Archive-grammar failures follow the established quarantine idiom:
    ``on_error="null"`` emits one NULL-url row per bad archive (the
    downstream contract already filters ``url IS NOT NULL``),
    ``"raise"`` raises. Scale shape: one archive per task through the
    standard Arrow fanout; nothing decompresses a body, so indexing
    is strictly cheaper than ingesting."""
    import hashlib
    from collections.abc import Iterator as _Iterator

    import pandas as pd

    if on_error not in ("raise", "null"):
        raise ValueError(
            f"on_error must be 'raise' or 'null'; got {on_error!r}"
        )

    cols = [
        "url", "warc_date", "mime", "status", "digest", "length",
        "offset", "filename",
    ]

    def _head_status_mime(block: bytes):
        if block[:5] != b"HTTP/":
            return None, None
        sep = block.find(b"\r\n\r\n")
        head = block[: sep if sep >= 0 else len(block)]
        lines = head.decode("utf-8", "replace").split("\r\n")
        status = None
        parts = lines[0].split()
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
        mime = None
        for line in lines[1:]:
            k, _, v = line.partition(":")
            if k.strip().lower() == "content-type":
                mime = v.split(";")[0].strip().lower() or None
                break
        return status, mime

    def _build(batches: "_Iterator[pd.DataFrame]"):
        from nextbus2pg_spark.sources.warc import (
            warc_iter_records_with_spans,
        )

        for pdf in batches:
            rows = []
            for fname, payload in zip(pdf["filename"], pdf["payload"]):
                try:
                    if payload is None or len(payload) == 0:
                        raise ValueError("empty archive payload")
                    for rec in warc_iter_records_with_spans(
                        bytes(payload)
                    ):
                        status, mime = _head_status_mime(rec["block"])
                        digest = rec["payload_digest"] or (
                            "md5:"
                            + hashlib.md5(rec["block"]).hexdigest()
                        )
                        rows.append(
                            (
                                rec["uri"] or None, rec["date"] or None,
                                mime, status, digest,
                                rec["length"], rec["offset"], fname,
                            )
                        )
                except ValueError:
                    if on_error == "raise" and not (
                        payload is None or len(payload) == 0
                    ):
                        raise
                    rows.append(
                        (None, None, None, None, None, None, None, fname)
                    )
            yield pd.DataFrame(rows, columns=cols).astype(
                {"status": "Int32", "length": "Int64", "offset": "Int64"}
            )

    from nextbus2pg_spark.operators.scale import ensure_min_parallelism

    src = ensure_min_parallelism(archives.select("filename", "payload"))
    raw = src.mapInPandas(_build, schema=_BUILD_SCHEMA)
    return raw.select(
        surt_key(F.col("url")).alias("surt"),
        F.to_timestamp("warc_date").alias("capture_ts"),
        "url",
        "mime",
        "status",
        "digest",
        "length",
        "offset",
        "filename",
    )
