"""Slowly-changing-dimension Type 2 merge (versioned dimension history).

The reference keeps dimension history two ways: upserts that silently
overwrite (``agency.py:60-71`` routes) and full re-snapshots stamped
with ``update_timestamp`` so "changes from day to day are not lost"
(``sql/create_tables.sql:91-92``, ``service_stop_order``). SCD2 is the
warehouse-native form of that second intent: one row per (key,
validity interval), closed rows immutable, exactly one open row per
live key.

100 TB design: one full-outer equi-join on the business key between
the *open* slice of the history and the incoming snapshot — closed
rows never join (filtered before the join, so the shuffle carries only
live keys), no window functions, no global sort. Change detection is
null-safe column comparison (JVM expressions). The output is a union
of four disjoint row sets, each a projection of the join result —
Catalyst collapses it into a single exchange per side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _same(tracked: Sequence[str]) -> Column:
    """Null-safe 'no tracked column changed' between cur.* and inc.*."""
    cond = F.lit(True)
    for c in tracked:
        cond = cond & F.col(f"cur.{c}").eqNullSafe(F.col(f"inc.{c}"))
    return cond


def scd2_merge(
    history: DataFrame,
    incoming: DataFrame,
    key: str,
    tracked: Sequence[str],
    batch_date,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one snapshot to an SCD2 history table; returns the new
    history.

    ``history`` carries ``key``, ``tracked``, ``valid_from`` and
    ``valid_to`` (NULL = open row). ``incoming`` carries ``key`` +
    ``tracked`` and must be deduped per key (use
    ``operators.dedup.dedup_groups`` upstream — the reference's
    within-batch dedup contract, ``agency.py:307-310``).

    Row fates:

    - closed history rows: immutable passthrough (never joined),
    - open rows with no incoming match: stay open (absence is not a
      delete — matches the reference, which never deletes dimensions),
    - open rows whose tracked columns all match: stay open (idempotent
      re-apply is a no-op),
    - open rows with any tracked change: closed at ``batch_date``, and
      the incoming version inserted open from ``batch_date``,
    - incoming rows with no open match: inserted open.
    """
    batch = F.lit(batch_date)
    cols = [key, *tracked, valid_from, valid_to]

    closed = history.where(F.col(valid_to).isNotNull()).select(*cols)
    open_rows = history.where(F.col(valid_to).isNull())

    j = open_rows.alias("cur").join(
        incoming.alias("inc"),
        F.col(f"cur.{key}") == F.col(f"inc.{key}"),
        "full_outer",
    )
    has_cur = F.col(f"cur.{key}").isNotNull()
    has_inc = F.col(f"inc.{key}").isNotNull()
    unchanged = _same(tracked)

    survivors = j.where(has_cur & (~has_inc | unchanged)).select(
        *(F.col(f"cur.{c}") for c in cols)
    )
    closed_now = j.where(has_cur & has_inc & ~unchanged).select(
        F.col(f"cur.{key}"),
        *(F.col(f"cur.{c}") for c in tracked),
        F.col(f"cur.{valid_from}"),
        # Cast to the history's valid_to type: an uncast lit(batch_date)
        # of a wider type (e.g. timestamp vs date) would silently widen
        # the whole column through union type-coercion, drifting the
        # schema away from bootstrap's across merges.
        batch.cast(closed.schema[valid_to].dataType).alias(valid_to),
    )
    inserts = j.where(has_inc & (~has_cur | ~unchanged)).select(
        F.col(f"inc.{key}"),
        *(F.col(f"inc.{c}") for c in tracked),
        batch.alias(valid_from),
        F.lit(None).cast(closed.schema[valid_to].dataType).alias(valid_to),
    )
    return closed.unionByName(survivors).unionByName(
        closed_now.toDF(*cols)
    ).unionByName(inserts.toDF(*cols))


def scd2_bootstrap(
    snapshot: DataFrame,
    key: str,
    tracked: Sequence[str],
    batch_date,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Turn a first snapshot into an SCD2 history (all rows open).

    ``valid_to``'s type is derived from ``batch_date`` (date in → date
    history, timestamp in → timestamp history) so the bootstrap schema
    matches what later ``scd2_merge`` calls stamp into ``valid_to``.
    """
    stamped = snapshot.select(
        key, *tracked, F.lit(batch_date).alias(valid_from)
    )
    vf_type = stamped.schema[valid_from].dataType
    return stamped.withColumn(valid_to, F.lit(None).cast(vf_type))


def scd2_as_of(
    history: DataFrame, as_of, valid_from: str = "valid_from", valid_to: str = "valid_to"
) -> DataFrame:
    """Point-in-time slice: the version of each key visible at ``as_of``
    (a time-travel read over the versioned dimension)."""
    ts = F.lit(as_of)
    return history.where(
        (F.col(valid_from) <= ts)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > ts))
    )
