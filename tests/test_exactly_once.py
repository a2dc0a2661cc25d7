"""Idempotent sink tests: replayed batch ids commit at most once; torn
writes (data without marker) are repaired by the replay."""

from __future__ import annotations

import os
import shutil

from nextbus2pg_spark.sinks.exactly_once import IdempotentParquetSink


def _batch(spark, tag):
    return spark.createDataFrame([(tag, 1), (tag, 2)], "tag string, v int")


def test_replayed_batch_commits_once(spark, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "log"))
    sink(_batch(spark, "b0"), batch_id=0)
    sink(_batch(spark, "b0"), batch_id=0)  # replay → skipped
    sink(_batch(spark, "b1"), batch_id=1)
    out = sink.read(spark)
    assert out.count() == 4  # 2 rows per batch, batch 0 once
    assert sink.committed(0) and sink.committed(1)


def test_torn_write_repaired_on_replay(spark, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "log"))
    sink(_batch(spark, "b0"), batch_id=0)
    # Simulate a crash AFTER data write, BEFORE marker: drop the marker.
    os.remove(os.path.join(str(tmp_path / "log"), "_commits", "0"))
    assert not sink.committed(0)
    sink(_batch(spark, "b0"), batch_id=0)  # replay overwrites its own dir
    assert sink.committed(0)
    assert sink.read(spark).count() == 2  # exactly one copy


def test_empty_batch_noop(spark, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "log"))
    empty = spark.createDataFrame([], "tag string, v int")
    sink(empty, batch_id=0)
    assert not sink.committed(0)  # nothing written, nothing marked


def test_streaming_end_to_end_exactly_once(spark, tmp_path):
    """Wire into start_ingest: restart replays nothing extra."""
    import json

    from nextbus2pg_spark.sources.feed import RAW_FEED_SCHEMA
    from nextbus2pg_spark.streaming.ingest import start_ingest

    feed = tmp_path / "feed"
    feed.mkdir()
    ck = str(tmp_path / "ck")
    base = {
        "route_tag": "38R", "dir_tag": "38R_out", "lon": "-122.4",
        "lat": "37.7", "secs_since_report": "10", "predictable": "true",
        "request_time_ms": 1706000000000,
    }
    with open(feed / "b1.json", "w") as f:
        f.write(json.dumps(dict(base, vehicle_id="v1")) + "\n")

    rs = spark.createDataFrame([("38R_out", "svc")], "tag string, service_id string")
    sink = IdempotentParquetSink(str(tmp_path / "log"))

    def run():
        stream = spark.readStream.schema(RAW_FEED_SCHEMA).json(str(feed))
        q = start_ingest(stream, lambda: (rs, rs), sink, ck)
        q.awaitTermination(120)

    run()
    assert sink.read(spark).count() == 1
    run()  # restart with no new data → no-op
    assert sink.read(spark).count() == 1
