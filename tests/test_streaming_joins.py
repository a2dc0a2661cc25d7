"""Event-time interval join (streaming/joins.py): batch semantics,
key/ts validation, and a true stream-stream run — two file streams
joined under watermarks, availableNow, append mode — whose output must
equal the identical plan run in batch."""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F

from nextbus2pg_spark.streaming.joins import interval_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _m(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _frames(spark):
    views = spark.createDataFrame(
        [
            (1, 10, _m(0)),
            (1, 11, _m(30)),
            (2, 12, _m(0)),
            (3, 13, _m(0)),   # user with no purchase
        ],
        "user_id long, view_id long, view_ts timestamp",
    )
    purchases = spark.createDataFrame(
        [
            (1, 90, _m(5)),    # matches view 10 (in [0, +10m])
            (1, 91, _m(38)),   # matches view 11 only
            (2, 92, _m(25)),   # outside every window
        ],
        "user_id long, purchase_id long, purchase_ts timestamp",
    )
    return views, purchases


def test_interval_join_batch_semantics(spark):
    views, purchases = _frames(spark)
    out = interval_join(
        views, purchases, "user_id", "view_ts", "purchase_ts",
        lower="0 seconds", upper="10 minutes",
    )
    got = sorted((r.view_id, r.purchase_id) for r in out.collect())
    assert got == [(10, 90), (11, 91)]
    # exactly one user_id column survives
    assert out.columns.count("user_id") == 1


def test_interval_join_left_outer_keeps_unmatched(spark):
    views, purchases = _frames(spark)
    out = interval_join(
        views, purchases, "user_id", "view_ts", "purchase_ts",
        upper="10 minutes", how="leftOuter",
    )
    got = {r.view_id: r.purchase_id for r in out.collect()}
    assert got[10] == 90 and got[11] == 91
    assert got[12] is None and got[13] is None


def test_interval_join_rejects_shared_ts_name(spark):
    views, purchases = _frames(spark)
    try:
        interval_join(views, views, "user_id", "view_ts", "view_ts")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_interval_join_stream_stream_equals_batch(spark, tmp_path):
    """Two real streams (file sources, maxFilesPerTrigger=1) joined
    with watermarks on both sides; the append-mode output across
    micro-batches must equal the batch run of the same plan."""
    vdir, pdir = tmp_path / "views", tmp_path / "purch"
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    vdir.mkdir(); pdir.mkdir()

    def wf(d, name, rows, mtime):
        p, t = d / name, d / (name + ".t")
        with open(t, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(t, p)
        os.utime(p, (mtime, mtime))

    def v(u, i, m):
        return {"user_id": u, "view_id": i, "view_ts": _m(m).isoformat()}

    def p(u, i, m):
        return {"user_id": u, "purchase_id": i,
                "purchase_ts": _m(m).isoformat()}

    base = 1_700_000_000
    wf(vdir, "v1.json", [v(1, 10, 0), v(2, 12, 1)], base)
    wf(vdir, "v2.json", [v(1, 11, 30)], base + 10)
    wf(pdir, "p1.json", [p(1, 90, 5)], base)
    wf(pdir, "p2.json", [p(1, 91, 38), p(2, 92, 25)], base + 10)

    def src(d, schema):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(str(d))
        )

    views = src(vdir, "user_id long, view_id long, view_ts timestamp")
    purchases = src(
        pdir, "user_id long, purchase_id long, purchase_ts timestamp"
    )
    joined = interval_join(
        views, purchases, "user_id", "view_ts", "purchase_ts",
        upper="10 minutes", watermark="10 minutes",
    ).select("user_id", "view_id", "purchase_id")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream-stream query timed out"

    got = sorted(
        (r.view_id, r.purchase_id)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(10, 90), (11, 91)]
