"""Join patterns from the reference's dataflow (SURVEY.md §2.5).

The reference joins via Python dicts probed row-by-row
(``/root/reference/agency.py:264-280``, ``route.py:117-136``) — i.e.
hand-rolled broadcast hash joins — plus SQL inner joins pushed to
Postgres (``agency.py:205-213``) and set-difference anti joins
(``route.py:76-78``). Here each becomes a declarative join Catalyst can
reorder/strategize; ``broadcast()`` hints mark the genuinely small
dimension sides so a 100 TB fact scan never shuffles for them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Small-dimension lookup join (J2: dict probe → broadcast hash join).

    Reference: ``service_dict`` built once and probed per vehicle row
    (``agency.py:264``, ``route.py:117-118``). The broadcast hint keeps
    the fact side shuffle-free regardless of its size.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def two_level_fallback(
    fact: DataFrame,
    primary: DataFrame,
    secondary: DataFrame,
    fact_key: str,
    lookup_key: str,
    value_col: str,
    out_col: str,
    drop_unresolved: bool = True,
) -> DataFrame:
    """Two-level dict fallback lookup (J6, ``route.py:177-194``).

    Resolve ``fact_key`` first in ``primary`` (route-scoped dict), then in
    ``secondary`` (agency-wide dict); rows resolving in neither are
    dropped (the reference logs-and-skips them, F5).
    Two broadcast left joins + COALESCE — no shuffle of the fact side.
    """
    p = primary.select(
        F.col(lookup_key).alias(fact_key), F.col(value_col).alias("__p_val")
    )
    s = secondary.select(
        F.col(lookup_key).alias(fact_key), F.col(value_col).alias("__s_val")
    )
    out = (
        fact.join(F.broadcast(p), fact_key, "left_outer")
        .join(F.broadcast(s), fact_key, "left_outer")
        .withColumn(out_col, F.coalesce(F.col("__p_val"), F.col("__s_val")))
        .drop("__p_val", "__s_val")
    )
    if drop_unresolved:
        out = out.where(F.col(out_col).isNotNull())
    return out


def top1_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence,
) -> DataFrame:
    """Deterministic top-1-per-key pick (J5/W2, ``agency.py:146-151``).

    The reference sorts candidate rows by a full column tuple and takes
    the first "so that choice of stop is deterministic". ``order_cols``
    must therefore be a total order within each partition.

    Scale: ``row_number`` over a window = one shuffle on the partition
    key + an in-partition sort. For heavily skewed keys prefer the
    ``F.max_by(struct(...))`` aggregation form (map-side partial
    aggregation shrinks the shuffle); both are provided.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def first_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Last/first-wins dict collapse, made deterministic (A4).

    Reference: ``dict([(serv[2], serv[0]) ...])`` collapses duplicate
    tags last-wins, with a TODO admitting the order is unspecified
    (``agency.py:259-263``). We adopt the TODO's fix: first row under a
    deterministic order, via ``min_by`` (partial-aggregatable — cheaper
    than a window at scale).
    """
    aggs = [F.min(order_col).alias(order_col)] + [
        F.min_by(c, F.col(order_col)).alias(c) for c in payload_cols
    ]
    return df.groupBy(*group_cols).agg(*aggs)
