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
candidates. The scale path is ``asof_join_bucketed``: both sides get a
time bucket, the right side is replicated across its visibility window
(bucket .. bucket+lookback), and the join becomes an equi-join on
(key, bucket) — each left row only ever meets a bounded time slice of
the right side, at the cost of a documented bounded-lookback contract.
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
    left_id: str | None = None,
) -> DataFrame:
    """Latest right row at-or-before each left row's timestamp.

    ``tiebreak``: extra right-side column ordered DESC after the
    timestamp so equal-timestamp candidates resolve deterministically.

    Safe for ANY left grain: the top-1 window partitions on a unique
    per-row key — ``left_id`` if the caller has one (cheaper: a single
    column sort key), else a derived physical-row id. The previous
    formulation partitioned on every left column, which silently
    collapsed duplicate left rows into one window (dropping rows) and
    over-partitioned otherwise; that hazard is gone by construction.
    The derived id is used only to isolate rows from each other, so the
    output doesn't depend on its values.
    """
    if left_id is not None:
        if how != "left":
            raise ValueError("left_id delegation supports how='left' only")
        return asof_join_by_id(
            left, right, left_id, left_on, right_on, left_ts, right_ts,
            right_cols, tiebreak,
        )
    if "__asof_id" in left.columns:
        raise ValueError("left already has a __asof_id column")
    l = left.withColumn("__asof_id", F.monotonically_increasing_id())
    r = right.select(
        F.col(right_on).alias("__r_key"),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c) for c in right_cols],
    )
    cond = (l[left_on] == r["__r_key"]) & (r["__r_ts"] <= l[left_ts])
    joined = l.join(r, cond, how)

    order = [F.col("__r_ts").desc_nulls_last()]
    if tiebreak:
        order.append(F.col(tiebreak).desc_nulls_last())
    w = Window.partitionBy("__asof_id").orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__r_key", "__r_ts", "__asof_id")
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    bucket_width: int,
    lookback: int = 1,
    tiebreak: str | None = None,
) -> DataFrame:
    """Big-big as-of join with a bounded lookback — the 100 TB path.

    ``left_ts``/``right_ts`` are integer time columns (epoch-µs; exact
    long arithmetic per PERF.md rule 6). Each right row is replicated
    into the ``lookback + 1`` buckets it is visible to, turning the
    range join into a plain equi-join on (key, bucket): a left row
    meets only the right rows of its own and the previous ``lookback``
    buckets, never the key's full history — candidate fan-out is
    bounded by construction regardless of either side's size.

    Contract: a right row older than ``lookback`` buckets before the
    left row is NOT matched (the left row gets NULLs). Pick
    ``bucket_width × lookback`` ≥ the staleness your enrichment
    tolerates. Winner selection is a ``max_by`` aggregation (map-side
    partial, no window sort), keyed on the unique ``left_id``.
    """
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c) for c in right_cols],
    ).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"__r_ts div {int(bucket_width)}"),
                F.expr(f"__r_ts div {int(bucket_width)}")
                + F.lit(int(lookback)),
            )
        ),
    )
    lb = F.expr(f"{left_ts} div {int(bucket_width)}")
    l = left.withColumn("__lb", lb)
    cond = (
        (l[on] == r["__k"])
        & (l["__lb"] == r["__b"])
        & (r["__r_ts"] <= l[left_ts])
    )
    joined = l.join(r, cond, "left")
    order = (
        F.struct("__r_ts", tiebreak) if tiebreak else F.struct("__r_ts")
    )
    best = joined.groupBy(left_id).agg(
        F.max_by(F.struct(*right_cols), order).alias("__m")
    )
    out_cols = [F.col(f"__m.{c}").alias(c) for c in right_cols]
    return left.join(
        best.select(left_id, *out_cols), left_id, "left"
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
