"""Streaming near-dup dedup (streaming/curation.start_neardup_dedup):
cross-batch suppression through the persistent index, survivors landing
idempotently, and resume across a stream restart."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from nextbus2pg_spark.pipelines.neardup_index import NearDupIndex
from nextbus2pg_spark.sinks.upsert import ParquetUpsertTable
from nextbus2pg_spark.streaming.curation import start_neardup_dedup


def _write_batch(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def _mk_text(i):
    return " ".join(f"tok{i}x{j}" for j in range(30))


def _run(spark, spool, idx, store, ckpt, matches_log):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(spool)
    )
    q = start_neardup_dedup(
        stream, idx, store, ckpt,
        matches_sink=lambda df, bid: matches_log.extend(
            (r["new_id"], r["indexed_id"]) for r in df.collect()
        ),
    )
    q.awaitTermination(120)


def test_stream_suppresses_cross_batch_neardups(spark, tmp_path):
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    idx = NearDupIndex(spark, str(tmp_path / "idx"), n_buckets=8)
    store = ParquetUpsertTable(
        spark, str(tmp_path / "docs"), key_cols=["doc_id"], n_buckets=4
    )
    matches: list = []

    _write_batch(spool, "b1.json", [(i, _mk_text(i)) for i in range(5)])
    _run(spark, spool, idx, store, ckpt, matches)
    assert store.read().count() == 5 and matches == []

    # batch 2: one near-dup of doc 3 (suppressed), one fresh (kept)
    _write_batch(spool, "b2.json", [
        (10, _mk_text(3) + " extra"),
        (11, _mk_text(99)),
    ])
    _run(spark, spool, idx, store, ckpt, matches)
    kept = sorted(r["doc_id"] for r in store.read().collect())
    assert kept == [0, 1, 2, 3, 4, 11]
    assert (10, 3) in matches
    assert idx.sigs.read().filter(F.col("id") == 10).count() == 0

    # batch 3 (fresh run of the same query = restart): near-dup of the
    # batch-2 SURVIVOR must also be suppressed — state is the index,
    # not watermark-bounded stream state
    _write_batch(spool, "b3.json", [(20, _mk_text(99) + " tail")])
    _run(spark, spool, idx, store, ckpt, matches)
    assert sorted(r["doc_id"] for r in store.read().collect()) == kept
    assert (20, 11) in matches
