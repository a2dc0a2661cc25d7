"""Event-time windowed aggregation tests (T8 extension surface):
tumbling/sliding watermarked rollups and built-in session windows —
batch-mode semantics plus a streaming run where the watermark
finalizes append-mode windows across micro-batches.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from nextbus2pg_spark.streaming.windows import (
    late_event_count,
    session_activity,
    windowed_activity,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _m(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _vehicles(spark, rows):
    return spark.createDataFrame(
        [(s, v, t) for s, v, t in rows],
        "service_id string, vehicle_tag string, location_timestamp timestamp_ntz",
    )


def test_windowed_activity_tumbling_batch(spark):
    df = _vehicles(
        spark,
        [
            ("svcA", "v1", _m(1)),
            ("svcA", "v2", _m(2)),
            ("svcA", "v1", _m(3)),
            ("svcA", "v1", _m(7)),  # next window
            ("svcB", "v9", _m(1)),
        ],
    )
    got = {
        (r.window_start, r.service_id): (r.n_events, r.approx_vehicles)
        for r in windowed_activity(df, "5 minutes").collect()
    }
    assert got[(_m(0), "svcA")] == (3, 2)
    assert got[(_m(5), "svcA")] == (1, 1)
    assert got[(_m(0), "svcB")] == (1, 1)


def test_windowed_activity_sliding_batch(spark):
    """A 10-min window sliding by 5 emits one row per covering window:
    an event at minute 7 belongs to [0,10) and [5,15)."""
    df = _vehicles(spark, [("svcA", "v1", _m(7))])
    got = sorted(
        (r.window_start, r.window_end)
        for r in windowed_activity(df, "10 minutes", slide="5 minutes").collect()
    )
    assert got == [(_m(0), _m(10)), (_m(5), _m(15))]


def test_session_activity_gap_merge(spark):
    """Events within the gap merge into one session (end = last event +
    gap); a later event opens a new one."""
    df = _vehicles(
        spark,
        [
            ("svcA", "v1", _m(0)),
            ("svcA", "v1", _m(10)),
            ("svcA", "v1", _m(60)),
        ],
    )
    got = sorted(
        (r.session_start, r.session_end, r.n_events)
        for r in session_activity(df, gap="30 minutes").collect()
    )
    assert got == [(_m(0), _m(40), 2), (_m(60), _m(90), 1)]


def test_late_event_count(spark):
    vehicles = spark.createDataFrame(
        [
            ("38R", _m(0)),    # 60 min behind frontier -> late
            ("38R", _m(55)),   # 5 min behind -> fine
            ("38R", _m(60)),
        ],
        "route_tag string, location_timestamp timestamp_ntz",
    )
    as_of = spark.createDataFrame(
        [("38R", _m(60))], "route_tag string, max_event_ts timestamp_ntz"
    )
    rows = late_event_count(vehicles, as_of, "10 minutes").collect()
    assert [(r.route_tag, r.n_late) for r in rows] == [("38R", 1)]


def test_windowed_activity_streaming_append(spark, tmp_path):
    """Streaming append mode: a window only lands once the watermark
    (derived from later batches' event times) passes its end — and the
    state for it is then dropped. Three micro-batches: data, a
    frontier-advancing event, and one more batch in which the finalized
    window is emitted."""
    feed = tmp_path / "wfeed"
    out = str(tmp_path / "wout")
    ck = str(tmp_path / "wck")
    feed.mkdir()

    def wf(name, rows, mtime):
        p = feed / name
        t = feed / (name + ".t")
        with open(t, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(t, p)
        os.utime(p, (mtime, mtime))

    def ev(svc, veh, minutes):
        return {
            "service_id": svc,
            "vehicle_tag": veh,
            "location_timestamp": _m(minutes).isoformat(),
        }

    base = 1_700_000_000
    wf("w1.json", [ev("svcA", "v1", 1), ev("svcA", "v2", 2)], base)
    wf("w2.json", [ev("svcA", "v9", 60)], base + 10)  # advances watermark to :50
    wf("w3.json", [ev("svcA", "v9", 61)], base + 20)  # batch that emits [0,5)

    stream = (
        spark.readStream.schema(
            "service_id string, vehicle_tag string, location_timestamp timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    q = (
        windowed_activity(stream, "5 minutes", watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.read.parquet(out).collect()
    got = {(r.window_start, r.service_id): r.n_events for r in rows}
    assert got[(_m(0), "svcA")] == 2  # the finalized window
    # the minute-60/61 windows are NOT emitted (watermark never passed them)
    assert all(ws < _m(50) for ws, _ in got)
