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
