"""Scalar expression library (SURVEY.md §2.9)."""

from nextbus2pg_spark.functions.scalar import (
    bool_from_string,
    epoch_ms_to_ts,
    event_time,
    null_safe_eq,
    null_safe_key,
    point_struct,
    point_text,
    ts_minus_seconds,
    utc_to_local_date,
)

__all__ = [
    "bool_from_string",
    "epoch_ms_to_ts",
    "event_time",
    "null_safe_eq",
    "null_safe_key",
    "point_struct",
    "point_text",
    "ts_minus_seconds",
    "utc_to_local_date",
]
