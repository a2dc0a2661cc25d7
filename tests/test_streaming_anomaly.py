"""Streaming rolling-anomaly stage (streaming/anomaly.py): late data
beyond the horizon is dropped, a restarted query resumes from the
checkpoint, a replayed micro-batch converges (keyed idempotence), and
within the retained horizon the flags equal the batch operator's."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nextbus2pg_spark.operators.timeseries import rolling_anomaly
from nextbus2pg_spark.sinks.upsert import ParquetUpsertTable
from nextbus2pg_spark.streaming.anomaly import (
    anomaly_batch,
    start_rolling_anomaly,
)

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)

# stable baseline with deterministic wobble, then a spike
B1 = [("k1", T0 + dt.timedelta(minutes=i), 10.0 + (i % 3) * 0.5)
      for i in range(12)]
B2 = [
    ("k1", T0 + dt.timedelta(minutes=14), 100.0),        # the anomaly
    ("k1", T0 - dt.timedelta(hours=2), 10.0),            # too late: drop
    ("k2", T0 + dt.timedelta(minutes=15), 5.0),          # idle key wakes
]

SCHEMA = "key string, ts timestamp, value double"
# tau=2: within its own trailing frame a point's |z| is capped at
# sqrt(n-1), so tau=3 needs n>=11 admitted rows to be reachable at all
PARAMS = dict(window_rows=12, min_periods=3, threshold_sq=4,
              horizon_seconds=3600)


def _stores(spark, tmp_path):
    points = ParquetUpsertTable(
        spark, str(tmp_path / "points"), key_cols=["key", "ts"],
        update_cols=["value"], n_buckets=4,
    )
    flags = ParquetUpsertTable(
        spark, str(tmp_path / "flags"), key_cols=["key", "ts"],
        update_cols=["value", "zscore", "is_anomaly"], n_buckets=4,
    )
    return points, flags


def test_stream_late_data_restart_and_batch_parity(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    points, flags = _stores(spark, tmp_path)
    late_counts = []

    spark.createDataFrame(B1, SCHEMA).write.parquet(str(src / "b1"))
    stream = lambda: (  # noqa: E731 - rebuilt per (re)start
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true").parquet(str(src))
    )
    q = start_rolling_anomaly(
        stream(), points, flags, str(tmp_path / "ckpt"),
        late_sink=lambda n, bid: late_counts.append(n), **PARAMS,
    )
    q.awaitTermination(120)

    # baseline: all points admitted, nothing flagged
    assert points.read().count() == 12
    got = {(r["key"], r["ts"]): r for r in flags.read().collect()}
    assert len(got) == 12 and not any(r["is_anomaly"] for r in got.values())
    assert late_counts == []

    # RESTART with the same checkpoint: only the new files replay
    spark.createDataFrame(B2, SCHEMA).write.parquet(str(src / "b2"))
    q = start_rolling_anomaly(
        stream(), points, flags, str(tmp_path / "ckpt"),
        late_sink=lambda n, bid: late_counts.append(n), **PARAMS,
    )
    q.awaitTermination(120)

    # the 2h-old row fell behind hwm - horizon: dropped and counted
    assert late_counts == [1]
    pts = points.read().collect()
    assert len(pts) == 14  # 12 + spike + k2; the late row absent
    assert min(r["ts"] for r in pts) == T0

    got = {(r["key"], r["ts"]): r for r in flags.read().collect()}
    spike = got[("k1", T0 + dt.timedelta(minutes=14))]
    assert spike["is_anomaly"] and spike["zscore"] > 2.0
    # k2 has a single point: below min_periods, never flagged
    k2 = got[("k2", T0 + dt.timedelta(minutes=15))]
    assert not k2["is_anomaly"] and k2["zscore"] is None
    # exactly one flag row per admitted point (keyed upsert, no dupes)
    assert len(got) == 14

    # batch parity within the horizon: the same operator over the
    # retained points produces byte-equal flags
    want = {
        (r["key"], r["ts"]): (r["value"], r["zscore"], r["is_anomaly"])
        for r in rolling_anomaly(
            points.read(), "key", "ts", "value",
            window_rows=PARAMS["window_rows"],
            min_periods=PARAMS["min_periods"],
            threshold_sq=PARAMS["threshold_sq"],
        ).collect()
    }
    assert {
        k: (r["value"], r["zscore"], r["is_anomaly"])
        for k, r in got.items()
    } == want


def test_replayed_micro_batch_converges(spark, tmp_path):
    """At-least-once: driving the batch body twice with the same data
    (a crash between apply and checkpoint commit) leaves both stores
    with identical content — keyed upserts absorb the replay."""
    points, flags = _stores(spark, tmp_path)
    b1 = spark.createDataFrame(B1, SCHEMA)
    anomaly_batch(b1, points, flags, **PARAMS)
    snap_pts = sorted(tuple(r) for r in points.read().collect())
    snap_flg = sorted(tuple(r) for r in flags.read().collect())

    anomaly_batch(b1, points, flags, **PARAMS)  # the replay
    assert sorted(tuple(r) for r in points.read().collect()) == snap_pts
    assert sorted(tuple(r) for r in flags.read().collect()) == snap_flg


def test_prune_truncates_trailing_windows_at_the_floor(spark, tmp_path):
    """The documented batch-vs-streaming delta: once the horizon
    advances, points behind the floor leave the store, and flags for
    newly arriving rows compute over the truncated frame (min_periods
    gates them) rather than the full history a batch run would see."""
    points, flags = _stores(spark, tmp_path)
    anomaly_batch(
        spark.createDataFrame(B1, SCHEMA), points, flags, **PARAMS
    )
    # two hours later: every B1 point is behind the new floor
    later = [("k1", T0 + dt.timedelta(hours=2, minutes=i), 20.0)
             for i in range(2)]
    anomaly_batch(
        spark.createDataFrame(later, SCHEMA), points, flags, **PARAMS
    )
    remaining = points.read().collect()
    assert {r["ts"] for r in remaining} == {t for _, t, _ in later}
    got = {r["ts"]: r for r in flags.read().where(
        F.col("ts") >= F.lit(T0 + dt.timedelta(hours=2))).collect()}
    # 2 points < min_periods=3: provisional, unflagged
    assert all(not r["is_anomaly"] for r in got.values())


def test_op_fn_swaps_in_cusum(spark, tmp_path):
    """The stage is operator-generic: a CUSUM op_fn rides the same
    lateness/retention/replay loop, and within the horizon the
    streamed flags equal the batch operator over the retained
    points."""
    from nextbus2pg_spark.operators.timeseries import cusum_changepoints

    points = ParquetUpsertTable(
        spark, str(tmp_path / "points"), key_cols=["key", "ts"],
        update_cols=["value"], n_buckets=4,
    )
    flags = ParquetUpsertTable(
        spark, str(tmp_path / "flags"), key_cols=["key", "ts"],
        update_cols=["value", "cusum_pos", "cusum_neg", "is_change"],
        n_buckets=4,
    )

    def cusum_op(pts):
        return cusum_changepoints(
            pts, "key", "ts", "value",
            target=10.0, slack=0.0, threshold=5.0, scale=1,
        )

    drift = [("k1", T0 + dt.timedelta(minutes=20 + i), 13.0)
             for i in range(4)]
    b1 = spark.createDataFrame(B1[:6] + drift[:2], SCHEMA)
    b2 = spark.createDataFrame(drift[2:], SCHEMA)
    anomaly_batch(b1, points, flags, op_fn=cusum_op, horizon_seconds=3600)
    anomaly_batch(b2, points, flags, op_fn=cusum_op, horizon_seconds=3600)

    got = {
        (r["key"], r["ts"]): (r["cusum_pos"], r["is_change"])
        for r in flags.read().collect()
    }
    want = {
        (r["key"], r["ts"]): (r["cusum_pos"], r["is_change"])
        for r in cusum_op(points.read()).collect()
    }
    assert got == want
    # the sustained +3 drift crosses the threshold by its 2nd point
    assert got[("k1", drift[1][1])][1] or got[("k1", drift[2][1])][1]

    # replay converges (keyed upserts)
    snap = sorted(tuple(r) for r in flags.read().collect())
    anomaly_batch(b2, points, flags, op_fn=cusum_op, horizon_seconds=3600)
    assert sorted(tuple(r) for r in flags.read().collect()) == snap


def test_op_fn_gap_detection_with_late_data_and_restart(spark, tmp_path):
    """Round-7 verdict task #7: gap detection (q_gap_detect semantics)
    through the streaming monitoring stage, driven via the REAL
    checkpointed stream path — a feed outage is flagged, a late
    mid-gap point SPLITS the gap on replay (keyed upsert revises the
    old gap row and inserts the new sub-gap), a beyond-horizon row is
    dropped and counted, and the store matches the batch operator over
    the retained points."""
    from nextbus2pg_spark.operators.timeseries import detect_gaps

    points = ParquetUpsertTable(
        spark, str(tmp_path / "points"), key_cols=["key", "ts"],
        update_cols=["value"], n_buckets=4,
    )
    flags = ParquetUpsertTable(
        spark, str(tmp_path / "flags"), key_cols=["key", "ts"],
        update_cols=["gap_start", "gap_seconds"], n_buckets=4,
    )

    def gap_op(pts):
        return detect_gaps(
            pts, "key", "ts", min_gap_seconds=300
        ).select(
            "key", F.col("gap_end").alias("ts"),
            "gap_start", "gap_seconds",
        )

    m = lambda i: T0 + dt.timedelta(minutes=i)  # noqa: E731
    src = tmp_path / "incoming"
    src.mkdir()
    late_counts = []
    stream = lambda: (  # noqa: E731 - rebuilt per (re)start
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true").parquet(str(src))
    )
    kw = dict(op_fn=gap_op, horizon_seconds=3600,
              late_sink=lambda n, bid: late_counts.append(n))

    # b1: heartbeat, then 20 minutes of silence, then it resumes
    b1 = [("k1", m(i), 1.0) for i in (0, 1, 2, 22, 23)]
    spark.createDataFrame(b1, SCHEMA).write.parquet(str(src / "b1"))
    q = start_rolling_anomaly(
        stream(), points, flags, str(tmp_path / "ckpt"), **kw
    )
    q.awaitTermination(120)
    got = {r["ts"]: r for r in flags.read().collect()}
    assert set(got) == {m(22)}
    assert got[m(22)]["gap_start"] == m(2)
    assert got[m(22)]["gap_seconds"] == 1200
    assert late_counts == []

    # b2 after RESTART (same checkpoint: only the new file replays):
    # a late point lands MID-GAP, a 2h-old row falls behind the
    # horizon, and a fresh point opens a second outage
    b2 = [("k1", m(12), 1.0),                     # late, splits the gap
          ("k1", T0 - dt.timedelta(hours=2), 1.0),  # beyond horizon
          ("k1", m(40), 1.0)]                     # new 17-min gap
    spark.createDataFrame(b2, SCHEMA).write.parquet(str(src / "b2"))
    q = start_rolling_anomaly(
        stream(), points, flags, str(tmp_path / "ckpt"), **kw
    )
    q.awaitTermination(120)

    assert late_counts == [1]
    assert points.read().count() == 7  # 5 + late-split + fresh
    got = {r["ts"]: (r["gap_start"], r["gap_seconds"])
           for r in flags.read().collect()}
    assert got == {
        m(12): (m(2), 600),    # first half of the split outage
        m(22): (m(12), 600),   # REVISED: latest-wins keyed upsert
        m(40): (m(23), 1020),  # the new outage
    }
    # batch parity over the retained points
    want = {r["ts"]: (r["gap_start"], r["gap_seconds"])
            for r in gap_op(points.read()).collect()}
    assert got == want
