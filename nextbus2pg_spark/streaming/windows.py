"""Event-time windowed aggregations over the vehicle stream — the T8
extension surface (SURVEY.md §2.10: the reference has *no* windows; it
only appends raw events, ``/root/reference/agency.py:303-322``). These
give the engine the standard late-data-tolerant rollups a consumer of
the ``vehicle_location`` log would otherwise hand-roll.

All three work identically on batch and streaming inputs (the window
expressions are ordinary grouping columns); on a stream the watermark
bounds state: Spark drops window state once event time passes
``watermark`` + window end, so state size tracks the watermark horizon,
not the stream length — the property that makes these safe on an
unbounded 100 TB/day feed.

Aggregates are chosen to be algebraic (count / approx_count_distinct /
min / max): partial aggregation happens map-side before the one shuffle
on (window, key); nothing here needs a holistic aggregate (exact
count-distinct would force full dedup state and is deliberately
excluded from the streaming path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Event-time column produced by the ingest pipeline (timestamp_ntz —
#: cast to zoned timestamp for watermarking, which requires TimestampType).
EVENT_COL = "location_timestamp"


def _with_event_tz(vehicles: DataFrame, watermark: str | None) -> DataFrame:
    out = vehicles.withColumn("event_ts", F.col(EVENT_COL).cast("timestamp"))
    if watermark is not None and out.isStreaming:
        out = out.withWatermark("event_ts", watermark)
    return out


def windowed_activity(
    vehicles: DataFrame,
    window_duration: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-service tumbling (or sliding, when ``slide`` is given)
    window rollup: event count + approximate distinct vehicles.

    Output: (window_start, window_end, service_id, n_events,
    approx_vehicles). Sliding windows emit one row per covering window
    (window_duration / slide rows per event) — the explode happens
    map-side before partial aggregation, so the shuffle still carries
    only one row per (window, service).
    """
    src = _with_event_tz(vehicles, watermark)
    win = (
        F.window("event_ts", window_duration, slide)
        if slide
        else F.window("event_ts", window_duration)
    )
    return (
        src.groupBy(win.alias("w"), "service_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("vehicle_tag").alias("approx_vehicles"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "service_id",
            "n_events",
            "approx_vehicles",
        )
    )


def session_activity(
    vehicles: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-vehicle session windows via the built-in ``session_window``
    (dynamic, gap-merged) — the declarative complement to the custom
    ``applyInPandasWithState`` sessionizer in ``streaming/stateful.py``
    (that one exists for semantics Spark can't express: per-event
    sequence numbers inside the session; this one is the right tool
    when plain per-session aggregates suffice).

    Output: (vehicle_tag, session_start, session_end, n_events).
    """
    src = _with_event_tz(vehicles, watermark)
    return (
        src.groupBy(
            F.session_window("event_ts", gap).alias("s"), "vehicle_tag"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "vehicle_tag",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def late_event_count(
    vehicles: DataFrame, as_of: DataFrame, lateness: str = "10 minutes"
) -> DataFrame:
    """Observability helper for picking a watermark: given a frame of
    processed events and a frame with the max event time per source
    partition (``as_of``: (route_tag, max_event_ts)), count events per
    route arriving more than ``lateness`` behind that route's frontier.

    Batch-only diagnostic (runs on the landed log, not the live
    stream); the count directly estimates what a given watermark would
    have dropped.
    """
    secs = F.expr(f"INTERVAL {lateness}")
    joined = vehicles.join(F.broadcast(as_of), "route_tag")
    return (
        joined.where(
            F.col(EVENT_COL).cast("timestamp")
            < F.col("max_event_ts").cast("timestamp") - secs
        )
        .groupBy("route_tag")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )
