"""Keyed-write semantics (SURVEY.md §2.2, K1-K6) as pure DataFrame algebra.

The reference's sinks are Postgres ``INSERT ... ON CONFLICT`` statements
(``/root/reference/agency.py:26-37,60-71,96-109,176-190,221-232,303-322``).
Their *query semantics* — what the table looks like after the write — are
reproduced here as batch DataFrame transforms so they can be
oracle-checked; the physical sink lives in ``nextbus2pg_spark.sinks``.

Key-stability contract (K1/K2): when an incoming row matches an existing
row on the business key, the EXISTING row wins on key + stable
(surrogate-id) columns and the INCOMING row wins on payload columns —
mirroring ``ON CONFLICT ... DO UPDATE SET (payload...) = (EXCLUDED...)``
discarding the freshly minted uuid4 (``agency.py:60-71``, SURVEY.md §1.3).

Scale: the merge is a single full-outer shuffle join on the business key.
At 100 TB the existing side is a partitioned/bucketed table: bucketing
both sides on the key makes this a co-located join with no shuffle of the
big side; a small incoming batch instead broadcast-joins (AQE converts
automatically below the broadcast threshold).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_E_FLAG = "__nb2pg_e"
_I_FLAG = "__nb2pg_i"


def _key_condition(key_cols: Sequence[str], null_safe: bool) -> Column:
    """Join condition over the business key, optionally NULL-tolerant.

    Uses alias-qualified column refs ("e."/"i.") so self-derived
    incoming batches don't trip Spark's ambiguous-self-join detection.
    ``null_safe=True`` mirrors the COALESCE-based unique indexes
    (``sql/create_tables.sql:63,86``): NULL keys collide with NULL keys.
    """
    cond = None
    for k in key_cols:
        e, i = F.col(f"e.{k}"), F.col(f"i.{k}")
        c = e.eqNullSafe(i) if null_safe else (e == i)
        cond = c if cond is None else (cond & c)
    assert cond is not None, "key_cols must be non-empty"
    return cond


def upsert_batch(
    existing: DataFrame,
    incoming: DataFrame,
    key_cols: Sequence[str],
    update_cols: Sequence[str] | None = None,
    null_safe: bool = True,
    dedup_incoming: bool = True,
) -> DataFrame:
    """Return the post-upsert state of ``existing`` after applying ``incoming``.

    - ``update_cols``: payload columns the incoming row overwrites on
      match (default: every non-key column that exists in both frames).
      Non-key columns *not* listed keep the existing value on match
      (surrogate-key stability, K2).
    - ``dedup_incoming``: collapse duplicate business keys inside the
      batch first, like ``SELECT DISTINCT ON (...)`` over the VALUES list
      (``agency.py:184``); which duplicate survives is unspecified there
      and here.
    """
    out_cols = existing.columns
    if update_cols is None:
        update_cols = [
            c for c in out_cols if c not in key_cols and c in incoming.columns
        ]
    if dedup_incoming:
        incoming = incoming.dropDuplicates(list(key_cols))

    e = existing.withColumn(_E_FLAG, F.lit(True)).alias("e")
    i = incoming.withColumn(_I_FLAG, F.lit(True)).alias("i")
    joined = e.join(i, _key_condition(key_cols, null_safe), "full_outer")

    matched_incoming = F.col(f"i.{_I_FLAG}").isNotNull()
    matched_existing = F.col(f"e.{_E_FLAG}").isNotNull()

    def ec(c: str) -> Column:
        return F.col(f"e.{c}")

    def ic(c: str) -> Column:
        return F.col(f"i.{c}")

    projections: list[Column] = []
    for c in out_cols:
        if c in key_cols:
            # Keys are pairwise equal (or null-safe-equal) on match; pick
            # whichever side is present.
            projections.append(
                F.when(matched_existing, ec(c)).otherwise(ic(c)).alias(c)
            )
        elif c in update_cols:
            # Payload: incoming wins when present (even if its value is
            # NULL — EXCLUDED.col semantics), else existing survives.
            projections.append(
                F.when(matched_incoming, ic(c)).otherwise(ec(c)).alias(c)
            )
        else:
            # Stable column (e.g. surrogate uuid): existing wins on match;
            # only brand-new keys take the incoming value.
            projections.append(
                F.when(matched_existing, ec(c)).otherwise(
                    ic(c) if c in incoming.columns else F.lit(None)
                ).alias(c)
            )
    return joined.select(*projections)


def insert_if_absent(
    existing: DataFrame,
    incoming: DataFrame,
    key_cols: Sequence[str],
    null_safe: bool = False,
) -> DataFrame:
    """``ON CONFLICT ... DO NOTHING`` (K5, ``agency.py:221-232``).

    Existing rows pass through untouched; incoming rows join left-anti
    against existing on the key and only the misses append. Idempotent:
    re-applying the same batch is a no-op.
    """
    incoming = incoming.dropDuplicates(list(key_cols)).select(existing.columns)
    e = existing.alias("e")
    i = incoming.alias("i")
    fresh = i.join(e, _key_condition(key_cols, null_safe), "left_anti")
    return existing.unionByName(fresh)


def append_dedup(batch: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Within-batch dedup before an append-only insert (K6, A2).

    ``SELECT DISTINCT ON (service_id, vehicle_tag, location_timestamp)``
    over the VALUES list (``agency.py:316-317``); duplicates *across*
    batches are accepted — the vehicle_location log is at-least-once by
    design (SURVEY.md §2.10 T4).
    """
    return batch.dropDuplicates(list(key_cols))
