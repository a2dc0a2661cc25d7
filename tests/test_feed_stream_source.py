"""Python DataSource V2 feed source: per-route offsets, incremental
micro-batches, checkpoint restart, batch mode — the reference's
request_times contract (route.py:151-170) as a first-class stream."""

from __future__ import annotations

import os

from nextbus2pg_spark.sources.feed_stream import VehicleFeedDataSource

XML = """<?xml version="1.0"?>
<body>
  <vehicle id="{vid}" dirTag="d1" lon="-122.4" lat="37.7"
           secsSinceReport="9" predictable="true"/>
  <lastTime time="{ms}"/>
</body>
"""


def _drop(spool, route, ms, vid):
    with open(os.path.join(spool, f"{route}__{ms}.xml"), "w") as f:
        f.write(XML.format(vid=vid, ms=ms))


def _run_stream(spark, spool, out_path, ckpt):
    q = (
        spark.readStream.format("nextbus_feed")
        .option("path", spool)
        .load()
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_path)


def test_stream_incremental_and_restart(spark, tmp_path):
    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _drop(spool, "38R", 1000, "v1")
    _drop(spool, "38R", 2000, "v2")
    _drop(spool, "J", 1500, "v9")
    got = _run_stream(spark, spool, out, ckpt)
    rows = {(r.route_tag, r.vehicle_id, r.request_time_ms)
            for r in got.collect()}
    assert rows == {("38R", "v1", 1000), ("38R", "v2", 2000),
                    ("J", "v9", 1500)}

    # Restart from the SAME checkpoint: old documents are not
    # reprocessed (offsets {route: last_ms} live in the checkpoint,
    # unlike the reference's in-memory dict), new ones are.
    _drop(spool, "38R", 3000, "v3")
    got = _run_stream(spark, spool, out, ckpt)
    rows = sorted((r.vehicle_id, r.request_time_ms) for r in got.collect())
    assert rows == [("v1", 1000), ("v2", 2000), ("v3", 3000), ("v9", 1500)]


def test_stream_empty_spool_yields_no_batch(spark, tmp_path):
    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    q = (
        spark.readStream.format("nextbus_feed")
        .option("path", spool)
        .load()
        .writeStream.format("memory")
        .queryName("feed_empty")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT * FROM feed_empty").count() == 0


def test_batch_mode_reads_full_spool(spark, tmp_path):
    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    _drop(spool, "38R", 1000, "v1")
    _drop(spool, "route_with_underscore", 2000, "v2")
    df = spark.read.format("nextbus_feed").option("path", spool).load()
    rows = {(r.route_tag, r.vehicle_id) for r in df.collect()}
    assert rows == {("38R", "v1"), ("route_with_underscore", "v2")}
    # schema matches the RAW_FEED_SCHEMA contract
    from nextbus2pg_spark.sources.feed import RAW_FEED_SCHEMA

    assert df.schema == RAW_FEED_SCHEMA


def test_end_to_end_reference_pipeline_on_dsv2_source(spark, tmp_path):
    """The whole reference app shape (run.py:29-66) on first-class
    parts: DSv2 feed source (per-route checkpointed offsets) →
    transform (route.py:197-204) → service resolution (two-level
    fallback) → event-grain dedup → append-only keyed store. Second
    run after new documents ingests ONLY the new batch (incremental)
    and the store accumulates, like vehicle_location (agency.py:
    303-322)."""
    from pyspark.sql import functions as F

    from nextbus2pg_spark.sinks.upsert import ParquetUpsertTable
    from nextbus2pg_spark.streaming.ingest import DEDUP_KEYS, start_ingest

    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    _drop(spool, "38R", 1_000_000, "v1")
    _drop(spool, "38R", 2_000_000, "v1")  # same vehicle, later doc
    _drop(spool, "J", 1_500_000, "v9")

    dims = spark.createDataFrame(
        [("d1", "svc-d1")], "tag string, service_id string"
    )
    table = ParquetUpsertTable(
        spark, str(tmp_path / "locations"), key_cols=list(DEDUP_KEYS),
        n_buckets=4,
    )

    def sink(batch_df, batch_id):
        table.append_dedup(batch_df)

    raw = (
        spark.readStream.format("nextbus_feed").option("path", spool).load()
    )
    q = start_ingest(
        raw,
        dims_provider=lambda: (dims, dims.limit(0)),
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    first = table.read().collect()
    # v1 appears twice (two request times -> two location timestamps)
    assert {(r.vehicle_tag, r.service_id) for r in first} == {
        ("v1", "svc-d1"), ("v9", "svc-d1")
    }
    assert len(first) == 3
    assert all(r.vehicle_location.lon == -122.4 for r in first)

    # Incremental restart: one new document, one new row.
    _drop(spool, "J", 3_000_000, "v9")
    q = start_ingest(
        raw,
        dims_provider=lambda: (dims, dims.limit(0)),
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert table.read().count() == 4
    # event time = request time (rounded s) - secsSinceReport (9s)
    ts = {
        r.location_timestamp for r in table.read().collect()
    }
    import datetime as dt

    assert dt.datetime(1970, 1, 1, 0, 49, 51) in ts  # 3000s - 9s


def test_permissive_mode_skips_corrupt_documents(spark, tmp_path):
    import pytest

    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    _drop(spool, "38R", 1000, "v1")
    with open(os.path.join(spool, "38R__2000.xml"), "w") as f:
        f.write("<body><vehicle id='truncated")  # mid-write capture
    # default failfast surfaces the parse error
    with pytest.raises(Exception):
        (
            spark.read.format("nextbus_feed").option("path", spool)
            .load().collect()
        )
    # permissive skips the bad document, keeps the good one
    rows = (
        spark.read.format("nextbus_feed").option("path", spool)
        .option("mode", "permissive").load().collect()
    )
    assert [(r.vehicle_id, r.request_time_ms) for r in rows] == [("v1", 1000)]


def test_max_docs_per_batch_bounds_backfill(spark, tmp_path):
    """Admission control: a 9-document backfill with
    max_docs_per_batch=3 drains in multiple bounded micro-batches —
    every document still lands exactly once."""
    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    for i in range(1, 10):
        _drop(spool, "38R", i * 1000, f"v{i}")
    batches = []

    def record(batch_df, batch_id):
        batches.append(batch_df.count())

    import time

    q = (
        spark.readStream.format("nextbus_feed")
        .option("path", spool)
        .option("max_docs_per_batch", "3")
        .load()
        .writeStream.foreachBatch(record)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    # continuous trigger: wait until the backfill drains, then stop
    deadline = time.time() + 120
    while sum(batches) < 9 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    assert sum(batches) == 9
    assert max(batches) <= 3
    assert len([b for b in batches if b]) >= 3
