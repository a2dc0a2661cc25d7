"""Streaming document-curation tests: batch/stream parity of the
curate transform, keep-filter rules, PII-scrub-before-score ordering,
and cross-batch fingerprint dedup through a checkpointed stream."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nextbus2pg_spark.streaming.curation import (
    curate_documents,
    start_curation,
)

GOOD = (
    "the quick brown fox jumps over a lazy dog and then naps while "
    "birds sing near the open window about a long warm day spent in "
    "the sun with a good friend and a folded map of the old city on "
    "the wall beside the green door where travelers once gathered to "
    "trade stories of distant harbors and the mountain roads they had "
    "crossed before winter closed every pass and the river froze "
    "solid under a pale sky full of slow clouds drifting east"
)  # 80+ distinct words past the 50-word floor, low trigram repetition

SPAMMY = "buy now " * 60  # high duplicate-trigram ratio
SHORT = "too short to keep"


def _doc(doc_id, text, ts="2024-01-01 10:00:00"):
    return (doc_id, text, dt.datetime.fromisoformat(ts))


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, ingest_ts timestamp"
    )


def test_curate_batch_rules_and_scrub_order(spark):
    rows = [
        _doc(1, GOOD + " mail me at bob@x.io"),
        _doc(2, SPAMMY),
        _doc(3, SHORT),
        _doc(4, GOOD + " mail me at alice@y.org"),  # dup after scrub
    ]
    out = curate_documents(_docs_df(spark, rows), min_words=50)
    kept = {r["doc_id"]: r for r in out.collect()}
    # Spam and short docs dropped; docs 1 and 4 differ ONLY in the
    # scrubbed span, so they share a fingerprint and one survives.
    assert set(kept) in ({1}, {4})
    survivor = next(iter(kept.values()))
    assert "<EMAIL>" in survivor["clean_text"]
    assert survivor["n_email"] == 1
    assert survivor["quality_score"] >= 0.5


def test_curate_stream_cross_batch_dedup(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    sink_rows = []

    # Batch 1: one good doc; batch 2: the same content resent (within
    # the watermark) plus one new good doc.
    _docs_df(spark, [_doc(1, GOOD)]).write.parquet(str(src / "b1"))
    _docs_df(
        spark,
        [_doc(10, GOOD, "2024-01-01 10:30:00"),
         _doc(11, GOOD + " fresh content appended here",
              "2024-01-01 10:31:00")],
    ).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, ingest_ts timestamp"
        ).option("recursiveFileLookup", "true").parquet(str(src))
    )
    q = start_curation(
        stream,
        lambda df, bid: sink_rows.extend(df.collect()),
        str(tmp_path / "ckpt"),
        min_words=50,
    )
    q.awaitTermination(120)

    fps = [r["fp"] for r in sink_rows]
    assert len(fps) == len(set(fps)) == 2  # resent content deduped
    assert {r["doc_id"] for r in sink_rows} <= {1, 10, 11}


def test_curate_is_stream_batch_identical(spark):
    rows = [_doc(1, GOOD), _doc(2, SPAMMY), _doc(3, GOOD + " extra tail")]
    batch = curate_documents(_docs_df(spark, rows), ts_col=None)
    cols = ["doc_id", "n_words", "dup_3gram_ratio", "quality_score", "fp"]
    got = sorted(tuple(r[c] for c in cols) for r in batch.select(cols).collect())
    assert [g[0] for g in got] == [1, 3]
