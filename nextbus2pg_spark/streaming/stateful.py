"""Custom stateful streaming operator: per-vehicle session tracking via
``applyInPandasWithState`` (SURVEY.md §2.10 notes the reference keeps no
stream state beyond offsets — this is the extension surface the
engine adds for continuous analytics over the vehicle feed).

Semantics: events for a key (vehicle) belong to one session while gaps
between consecutive event times stay under ``gap_seconds``; a larger
gap (or state timeout) closes the session and emits a summary row.

Scale design: state is partitioned by the grouping key — the same
shuffle any stateful operator pays, and the only one in the pipeline.
State per key is O(1) (counters + last timestamp), so state store size
tracks |active keys|, not event volume. Processing-time timeouts evict
idle keys, bounding the store.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("vehicle_tag", StringType(), False),
        StructField("session_start_us", LongType(), True),
        StructField("session_end_us", LongType(), True),
        StructField("n_events", IntegerType(), True),
        StructField("mean_value", DoubleType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), True),
        StructField("last_us", LongType(), True),
        StructField("n", IntegerType(), True),
        StructField("value_sum", DoubleType(), True),
    ]
)


def make_session_fn(
    gap_seconds: int = 1800,
    emit_open: bool = False,
    use_timeout: bool = False,
):
    """Build the applyInPandasWithState function (injectable gap for
    tests). Input rows need ``vehicle_tag``, ``ts_us`` (long) and
    ``value`` (double) columns.

    Emits one row per CLOSED session; with ``emit_open`` the current
    open session is also emitted each batch (dashboard mode — rows for
    the same session then repeat across batches, at-least-once style).

    ``use_timeout`` registers a processing-time timeout so idle keys
    flush+evict (the production pattern for bounding the state store).
    Off by default: this PySpark build (4.1.2, local mode) crashes the
    Python worker when state carrying a timeout timestamp is read back
    in a later micro-batch — verified empirically; the NoTimeout path
    is stable. (The newer ``transformWithStateInPandas`` API needs
    protobuf, which this container lacks.)

    **Idle-close without timeouts**: rows flagged ``is_tick = true``
    (see ``flush_ticks``) advance the session clock WITHOUT counting as
    events — a key whose gap to the tick timestamp exceeds
    ``gap_seconds`` closes, emits, and evicts its state. Unioning a
    periodic tick frame into the stream therefore emulates
    ProcessingTimeTimeout with plain data flow: idle sessions close and
    the state store stays bounded even when a vehicle never reports
    again. Ticks for keys with no open session are no-ops (no state is
    created for them).

    **Tick cadence contract**: a tick at processing time ``t`` closes
    every session whose last event is ≤ ``t - gap_seconds``. With
    ticks injected every ``Δ`` seconds, an idle session is therefore
    guaranteed closed (and its state evicted) within
    ``gap_seconds + Δ`` of its last event — choose
    ``Δ = close_latency_SLA − gap_seconds`` (e.g. gap 1800s, SLA
    2100s → tick every ≤300s / one per ~10 micro-batches at a 30s
    trigger). State size between ticks is bounded by the number of
    keys active within one ``gap + Δ`` horizon. Over-ticking is safe
    (idempotent; one extra row per key per flush); under-ticking never
    loses data — it only delays session close and state eviction.
    """
    gap_us = gap_seconds * 1_000_000

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (vehicle_tag,) = key
        if state.hasTimedOut:
            for _ in pdfs:  # drain the (empty) Arrow input stream
                pass
            start_us, last_us, n, value_sum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "vehicle_tag": [vehicle_tag],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "n_events": [n],
                    "mean_value": [value_sum / n if n else None],
                }
            )
            return

        rows = pd.concat(list(pdfs))
        tick_us = None
        if "is_tick" in rows.columns:
            tick_mask = rows["is_tick"].fillna(False).astype(bool)
            ticks = rows[tick_mask]
            if len(ticks):
                tick_us = int(ticks["ts_us"].max())
            rows = rows[~tick_mask]
        rows = rows.sort_values("ts_us")
        if state.exists:
            start_us, last_us, n, value_sum = state.get
        else:
            start_us = last_us = None
            n = 0
            value_sum = 0.0

        closed: list[tuple] = []
        for ts_us, value in zip(rows["ts_us"], rows["value"]):
            ts_us = int(ts_us)
            if last_us is not None and ts_us - last_us > gap_us:
                closed.append((start_us, last_us, n, value_sum))
                start_us, n, value_sum = ts_us, 0, 0.0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            n += 1
            value_sum += float(value) if value == value else 0.0

        if (
            tick_us is not None
            and last_us is not None
            and tick_us - last_us > gap_us
        ):
            # Idle past the gap at tick time: close + evict (the
            # timeout-emulation path — state store stays bounded).
            closed.append((start_us, last_us, n, value_sum))
            state.remove()
            start_us = last_us = None  # nothing open for emit_open
        elif start_us is not None:
            state.update((start_us, last_us, n, value_sum))
            if use_timeout:
                state.setTimeoutDuration(gap_seconds * 1000)
        # else: tick for a key with no open session — leave no state.

        out = list(closed)
        if emit_open and start_us is not None:
            out.append((start_us, last_us, n, value_sum))
        if out:
            yield pd.DataFrame(
                {
                    "vehicle_tag": [vehicle_tag] * len(out),
                    "session_start_us": [o[0] for o in out],
                    "session_end_us": [o[1] for o in out],
                    "n_events": [o[2] for o in out],
                    "mean_value": [
                        o[3] / o[2] if o[2] else None for o in out
                    ],
                }
            )

    return update


def flush_ticks(keys: DataFrame, tick_ts_us: int) -> DataFrame:
    """Build tick rows for the given keys at a processing-time instant.

    ``keys``: a frame with ``vehicle_tag`` (e.g. the vehicle dimension,
    or the distinct keys of the last N batches). Union the result into
    the sessionizer input each flush interval; any key idle past
    ``gap_seconds`` at ``tick_ts_us`` then closes and evicts — the
    ProcessingTimeTimeout emulation for environments where the native
    timeout is unavailable (see ``make_session_fn``). Keys without an
    open session are unaffected (ticks never create state), so
    over-ticking is safe: cost is one extra row per key per flush.
    """
    from pyspark.sql import functions as F

    return keys.select("vehicle_tag").distinct().select(
        "vehicle_tag",
        F.lit(int(tick_ts_us)).cast("long").alias("ts_us"),
        F.lit(None).cast("double").alias("value"),
        F.lit(True).alias("is_tick"),
    )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    emit_open: bool = False,
    use_timeout: bool = False,
) -> DataFrame:
    """Group the (streaming) event frame by vehicle and run the custom
    stateful sessionizer. Works on batch frames too (state per batch).
    See ``make_session_fn`` for the ``use_timeout`` caveat.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if use_timeout
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("vehicle_tag").applyInPandasWithState(
        make_session_fn(gap_seconds, emit_open, use_timeout),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
