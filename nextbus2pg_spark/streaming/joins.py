"""Event-time interval joins — stream-stream enrichment the reference
pipeline cannot express at all (it lands rows into Postgres and leaves
correlation to later SQL, ``/root/reference/agency.py:303-322``): match
each left event to right events with the same key whose event time
falls inside ``[left_ts - lower, left_ts + upper]``.

The SAME plan runs batch and streaming. On two streams, the watermark
on both sides plus the two-sided time-range predicate is exactly what
Spark needs to bound join state: each side's buffered rows are evicted
once the other side's watermark passes the reachable time range, so
state tracks the interval width × arrival rate, never the stream
length — the property that makes this safe on an unbounded feed.

Scale shape: an equi-join on the key (hash-partitioned shuffle, AQE
picks broadcast when one side is small in batch mode) with the time
bounds as a post-join range predicate — Spark evaluates them inside
the join operator (stream-stream joins REQUIRE the equality key; the
range alone would be a cartesian). Skewed keys salt exactly like any
other equi-join (operators/scale.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "0 seconds",
    watermark: str | None = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` to ``right`` on ``key`` equality AND
    ``right_ts`` ∈ ``[left_ts - lower, left_ts + upper]``.

    ``left_ts`` / ``right_ts`` must be DISTINCT column names (rename
    before calling — the output carries both, which a shared name
    would make ambiguous); non-key, non-ts columns should be disjoint
    for the same reason. ``how`` supports ``inner`` and ``leftOuter``
    (the outer forms additionally require watermarks on streams so
    Spark knows when an unmatched row is final).

    On streaming inputs each side gets ``withWatermark`` on its own
    event-time column; batch inputs pass through untouched, so one
    call site serves the landed log and the live feed.
    """
    if left_ts == right_ts:
        raise ValueError(
            f"left_ts and right_ts must differ (both {left_ts!r}); "
            "rename one side before joining"
        )
    # Right-preserving joins would lose the key entirely: the output
    # keeps only l.<key>, which is NULL on right-unmatched rows.
    if how.replace("_", "").lower() not in {"inner", "leftouter", "left"}:
        raise ValueError(
            f"how={how!r} unsupported: only inner/leftOuter keep the "
            "join key intact (right keys are dropped from the output)"
        )
    keys = [key] if isinstance(key, str) else list(key)
    l = left
    r = right
    if watermark is not None and l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if watermark is not None and r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    l = l.alias("l")
    r = r.alias("r")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys],
    )
    cond = (
        cond
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
        )
    )
    out = l.join(r, cond, how)
    for k in keys:
        out = out.drop(F.col(f"r.{k}"))
    return out
