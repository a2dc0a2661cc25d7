"""Scalar functions mirroring the reference's expression surface.

Each function documents the reference behavior it reproduces with a
``file:line`` citation into ``/root/reference/`` (see SURVEY.md §2.9).
All are thin builders over built-in ``pyspark.sql.functions`` — JVM-side,
codegen-friendly; no Python UDFs anywhere on these paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bool_from_string(col: Column | str) -> Column:
    """``'true'`` → True, anything else → False.

    Reference: ``route.py:33`` (``useForUI``), ``route.py:203``
    (``predictable``) — a string compare, not a cast, so ``'True'``/NULL
    are False, matching ``i.get(...) == 'true'`` semantics.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.eqNullSafe(F.lit("true"))


def epoch_ms_to_ts(ms: Column | str) -> Column:
    """Epoch-milliseconds → timestamp, **rounding** to whole seconds.

    Reference: ``route.py:165-167`` —
    ``datetime.utcfromtimestamp(round(float(ms)/1000))``. Note ROUND,
    not truncate: 1500 ms → 2 s. HALF_UP rounding for positive epochs
    matches Python's float→round here for all realistic (non-.5-exact
    binary) inputs.
    """
    c = F.col(ms) if isinstance(ms, str) else ms
    secs = F.round(c.cast("double") / F.lit(1000.0), 0).cast("long")
    return F.timestamp_seconds(secs).cast("timestamp_ntz")


def ts_minus_seconds(ts: Column | str, secs: Column | str) -> Column:
    """``ts - secs`` where secs may be fractional (double seconds).

    Reference: ``route.py:202`` — event time = request time −
    ``secsSinceReport``. Implemented in the µs-integer domain so results
    are exact and engine-portable (interval × double rounding differs
    across engines).
    """
    t = F.col(ts) if isinstance(ts, str) else ts
    s = F.col(secs) if isinstance(secs, str) else secs
    us = F.unix_micros(t.cast("timestamp")) - F.round(
        s.cast("double") * F.lit(1000000.0), 0
    ).cast("long")
    return F.timestamp_micros(us).cast("timestamp_ntz")


def event_time(request_ts: Column | str, secs_since_report: Column | str) -> Column:
    """Alias for the reference's event-time derivation (``route.py:197-204``)."""
    return ts_minus_seconds(request_ts, secs_since_report)


def utc_to_local_date(ts: Column | str, tz: str) -> Column:
    """UTC timestamp → local calendar date.

    Reference: ``run.py:60,103-111`` — ``pytz`` zone conversion then
    ``.date()`` for the midnight-rollover dimension refresh.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.to_date(F.from_utc_timestamp(c.cast("timestamp"), tz))


def point_struct(lon: Column | str, lat: Column | str) -> Column:
    """lon/lat → ``struct<lon double, lat double>``.

    Reference: ``agency.py:179,308`` —
    ``ST_SetSRID(ST_MakePoint(lon,lat),4326)``. SRID 4326 is constant and
    the reference runs zero spatial predicates (SURVEY.md §1.2), so a
    struct is the faithful Spark model; no UDT needed.
    """
    lo = F.col(lon) if isinstance(lon, str) else lon
    la = F.col(lat) if isinstance(lat, str) else lat
    return F.struct(
        lo.cast("double").alias("lon"), la.cast("double").alias("lat")
    )


def point_text(point: Column | str) -> Column:
    """Canonical byte-stable text form of a point, for key equality.

    Reference: ``TEXT(location)`` inside the stop conflict key
    (``sql/create_tables.sql:86``, ``agency.py:188``). Fixed-precision
    printf so the text is identical across engines/runs (SURVEY.md §7
    hard-part #5).
    """
    p = F.col(point) if isinstance(point, str) else point
    return F.when(p.isNull(), F.lit(None).cast("string")).otherwise(
        F.format_string("POINT(%.6f %.6f)", p["lon"], p["lat"])
    )


def null_safe_eq(left: Column | str, right: Column | str) -> Column:
    """NULL-tolerant equality for business keys (``a <=> b``).

    Reference: unique indexes on ``COALESCE(tag,'')`` /
    ``COALESCE(TEXT(location),'')`` (``sql/create_tables.sql:63,86``) and
    matching conflict targets (``agency.py:100,188``): NULL collides with
    NULL, once.
    """
    l = F.col(left) if isinstance(left, str) else left
    r = F.col(right) if isinstance(right, str) else right
    return l.eqNullSafe(r)


def null_safe_key(col: Column | str, empty: str = "") -> Column:
    """The COALESCE-to-sentinel form of a NULL-tolerant key column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(empty))
