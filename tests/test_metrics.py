"""Observed metrics ride the job itself — batch values after one
action, streaming values in each micro-batch's progress."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from nextbus2pg_spark.operators.metrics import observe_stream, observed


def test_batch_observed_metrics(spark):
    df = spark.range(100).select(
        "id", F.when(F.col("id") % 10 == 0, None).otherwise("x").alias("tag")
    )
    df2, obs = observed(
        df,
        n=F.count(F.lit(1)),
        null_tags=F.count_if(F.col("tag").isNull()),
        max_id=F.max("id"),
    )
    assert df2.count() == 100  # the action that fills the metrics
    assert obs.get == {"n": 100, "null_tags": 10, "max_id": 99}


def test_streaming_observed_metrics(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "b0.json").write_text(
        "\n".join(json.dumps({"v": i}) for i in range(7)), encoding="utf-8"
    )
    stream = spark.readStream.schema("v long").json(str(src))
    stream = observe_stream(
        stream, "ingest", n=F.count(F.lit(1)), v_max=F.max("v")
    )
    seen = {}

    def sink(batch_df, batch_id):
        batch_df.count()

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for p in q.recentProgress:
        seen.update(p.observedMetrics)
    m = seen["ingest"]
    assert m["n"] == 7 and m["v_max"] == 6, seen
