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


def _string_keys(df: DataFrame, key_cols: Sequence[str]) -> frozenset:
    from pyspark.sql.types import StringType

    return frozenset(
        c for c in key_cols if isinstance(df.schema[c].dataType, StringType)
    )


def _key_condition(
    key_cols: Sequence[str], null_safe: bool, string_keys: frozenset = frozenset()
) -> Column:
    """Join condition over the business key, optionally NULL-tolerant.

    Uses alias-qualified column refs ("e."/"i.") so self-derived
    incoming batches don't trip Spark's ambiguous-self-join detection.
    ``null_safe=True`` mirrors the COALESCE-based unique indexes
    EXACTLY (``sql/create_tables.sql:63,86``): STRING keys compare as
    ``COALESCE(k, '')``, so NULL collides with NULL *and with the
    empty string* — the two wire forms of a missing XML attribute land
    on one row, as they do under the reference's Postgres index. (A
    bare ``eqNullSafe`` would treat NULL and '' as distinct keys and
    diverge from the reference on that edge; ``sinks/store.
    bucket_expr`` already co-locates the two forms in one bucket on
    the same reasoning.) Non-string keys — where '' does not exist —
    use plain null-safe equality, preserving native numeric equality
    (-0.0 == 0.0, NaN != NaN).
    """
    cond = None
    for k in key_cols:
        e, i = F.col(f"e.{k}"), F.col(f"i.{k}")
        if null_safe and k in string_keys:
            c = F.coalesce(e, F.lit("")) == F.coalesce(i, F.lit(""))
        elif null_safe:
            c = e.eqNullSafe(i)
        else:
            c = e == i
        cond = c if cond is None else (cond & c)
    assert cond is not None, "key_cols must be non-empty"
    return cond


def _dedup_on_keys(
    df: DataFrame,
    key_cols: Sequence[str],
    null_safe: bool,
    null_safe_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Within-batch key collapse. ``dropDuplicates`` already groups
    NULL with NULL; ``null_safe`` additionally folds NULL into ``''``
    (the COALESCE unique-index key form, ``sql/create_tables.sql:63``)
    via throwaway normalized columns, so the dedup grain is exactly
    the merge/constraint grain.

    ``null_safe_cols`` restricts the folding to the columns that are
    actually COALESCE-indexed (the JDBC writer's per-column
    ``null_safe_keys``); default = every STRING key column (the
    engine-internal contract, matching ``_key_condition``). Folding a
    column the store treats as NULL-distinct would silently drop rows
    the database considers distinct keys.
    """
    if null_safe:
        strs = (
            frozenset(null_safe_cols)
            if null_safe_cols is not None
            else _string_keys(df, key_cols)
        )
    else:
        strs = frozenset()
    if not strs:
        return df.dropDuplicates(list(key_cols))
    tmp, grain = [], []
    for j, k in enumerate(key_cols):
        if k in strs:
            t = f"__ks_{j}"
            df = df.withColumn(t, F.coalesce(F.col(k), F.lit("")))
            tmp.append(t)
            grain.append(t)
        else:
            grain.append(k)
    return df.dropDuplicates(grain).drop(*tmp)


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
      and here. With ``null_safe`` the collapse uses the SAME
      NULL-tolerant key form as the join (NULL collides with ``''``) —
      otherwise a batch carrying both forms of one key would match a
      single existing row twice and emit duplicate output rows (the
      multi-row-VALUES case Postgres rejects outright on the COALESCE
      index).
    """
    out_cols = existing.columns
    if update_cols is None:
        update_cols = [
            c for c in out_cols if c not in key_cols and c in incoming.columns
        ]
    if dedup_incoming:
        incoming = _dedup_on_keys(incoming, key_cols, null_safe)

    e = existing.withColumn(_E_FLAG, F.lit(True)).alias("e")
    i = incoming.withColumn(_I_FLAG, F.lit(True)).alias("i")
    joined = e.join(
        i,
        _key_condition(key_cols, null_safe, _string_keys(existing, key_cols)),
        "full_outer",
    )

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
    re-applying the same batch is a no-op. Within-batch dedup uses the
    same null-safe key form as the join (see ``_dedup_on_keys``).
    """
    incoming = _dedup_on_keys(incoming, key_cols, null_safe).select(
        existing.columns
    )
    e = existing.alias("e")
    i = incoming.alias("i")
    fresh = i.join(
        e,
        _key_condition(key_cols, null_safe, _string_keys(existing, key_cols)),
        "left_anti",
    )
    return existing.unionByName(fresh)


def append_dedup(batch: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Within-batch dedup before an append-only insert (K6, A2).

    ``SELECT DISTINCT ON (service_id, vehicle_tag, location_timestamp)``
    over the VALUES list (``agency.py:316-317``); duplicates *across*
    batches are accepted — the vehicle_location log is at-least-once by
    design (SURVEY.md §2.10 T4).
    """
    return batch.dropDuplicates(list(key_cols))
