"""Dead-letter quarantine tests: one-pass valid/invalid split with
violation diagnostics, batch and streaming (foreachBatch side-writes)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from nextbus2pg_spark.operators.quality import profile, quarantine_split


def _checks():
    return {
        "lat_range": F.col("lat").between(-90.0, 90.0),
        "has_vehicle": F.col("vehicle_id").isNotNull(),
    }


def test_quarantine_split_batch(spark):
    df = spark.createDataFrame(
        [
            ("v1", 37.7),
            ("v2", 123.0),   # lat out of range
            (None, 200.0),   # both checks fail
        ],
        "vehicle_id string, lat double",
    )
    valid, quar = quarantine_split(df, _checks())
    assert [r.vehicle_id for r in valid.collect()] == ["v1"]
    got = {tuple(r._violations) for r in quar.collect()}
    assert got == {("lat_range",), ("lat_range", "has_vehicle")}


def test_quarantine_streaming_side_write(spark, tmp_path):
    feed = tmp_path / "qfeed"
    feed.mkdir()
    rows = [
        {"vehicle_id": "v1", "lat": 37.7},
        {"vehicle_id": "v2", "lat": 123.0},
    ]
    with open(feed / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    good_path = str(tmp_path / "good")
    bad_path = str(tmp_path / "bad")

    def process(batch_df, batch_id):
        valid, quar = quarantine_split(batch_df, _checks())
        valid.write.mode("append").parquet(good_path)
        quar.withColumn(
            "_violations", F.array_join("_violations", ",")
        ).write.mode("append").parquet(bad_path)

    stream = spark.readStream.schema("vehicle_id string, lat double").json(
        str(feed)
    )
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "qck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert [r.vehicle_id for r in spark.read.parquet(good_path).collect()] == ["v1"]
    bad = spark.read.parquet(bad_path).collect()
    assert len(bad) == 1 and bad[0]._violations == "lat_range"


def test_profile_one_pass(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (2, "b", None)],
        "k int, s string, v double",
    )
    got = {r["column"]: r for r in profile(df).collect()}
    assert got["k"].n_rows == 3 and got["k"].n_distinct == 2
    assert got["s"].n_nulls == 1 and got["s"].min_num is None
    assert got["v"].min_num == 1.5 and got["v"].max_num == 2.5
