"""Data-quality assertion operator — the engine's generalization of the
reference's CHECK constraint (F6, ``sql/create_tables.sql:106-107``)
and FK expectations (SURVEY.md §1.4: FKs become assertion queries).

``run_checks`` computes every check in ONE aggregation pass over the
frame (no per-check scans — at 100 TB each extra scan is the cost), and
``enforce`` filters violations out of the write path exactly like the
reference's DB-side constraint rejection.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def run_checks(df: DataFrame, checks: Mapping[str, Column]) -> dict[str, int]:
    """Count violations per named check in one pass.

    ``checks`` maps name → boolean Column that should be TRUE for every
    row (NULL counts as a violation, matching SQL CHECK semantics where
    only TRUE passes... note: SQL CHECK actually passes NULL; we count
    NULL as violating because pipelines want to see them — use
    ``coalesce(cond, lit(True))`` to opt into SQL semantics).
    Returns {check_name: violation_count}.
    """
    aggs = [
        F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias(name)
        for name, cond in checks.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return {name: row[name] for name in checks}


def enforce(df: DataFrame, checks: Mapping[str, Column]) -> DataFrame:
    """Drop rows violating any check (write-path constraint filter,
    K-path analogue of Postgres rejecting the row)."""
    cond = None
    for c in checks.values():
        c = F.coalesce(c, F.lit(False))
        cond = c if cond is None else (cond & c)
    return df if cond is None else df.where(cond)


def quarantine_split(
    df: DataFrame, checks: Mapping[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, quarantined) — the dead-letter pattern.

    Quarantined rows carry a ``_violations`` array naming every failed
    check, so the side channel is diagnosable without re-deriving the
    rules. Both outputs come from ONE evaluation of the check
    expressions (a projected flags column), not one scan per check;
    downstream consumes each side lazily.

    Streaming use: call inside ``foreachBatch`` and write the
    quarantine side to its own path — rows are never silently dropped
    (contrast: the reference logs-and-drops unresolved vehicles,
    ``/root/reference/route.py:183-194``).
    """
    flags = F.array(
        *[
            F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
            for name, cond in checks.items()
        ]
    )
    flagged = df.withColumn(
        "_violations", F.filter(flags, lambda x: x.isNotNull())
    )
    valid = flagged.where(F.size("_violations") == 0).drop("_violations")
    quarantined = flagged.where(F.size("_violations") > 0)
    return valid, quarantined


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column data profile in ONE aggregation pass:
    (column, n_rows, n_nulls, n_distinct, min_num, max_num) — numeric
    min/max only for numeric columns (NULL otherwise; stringly min/max
    is not portable across engines' formatting).

    One wide agg row → ``inline`` explode to long form. At scale this
    is a single scan + single-row shuffle regardless of column count;
    exact count_distinct is the costly part (per-column distinct
    state) — swap for approx_count_distinct on wide production tables.
    """
    cols = columns or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("integer", "long", "double", "float", "short", "decimal")
    }
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                (
                    F.col(f"__min_{c}")
                    if c in numeric
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"__max_{c}")
                    if c in numeric
                    else F.lit(None).cast("double")
                ).alias("max_num"),
            )
            for c in cols
        ]
    )
    return wide.select(F.inline(rows))


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """FK assertion query: child rows whose key misses the parent
    (SURVEY.md §1.4 — Spark doesn't enforce FKs; this is the audit).
    Left-anti join: only unmatched rows flow, no row explosion."""
    p = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(F.broadcast(p), child_key, "left_anti")


def profile_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    columns: "list[str] | None" = None,
) -> DataFrame:
    """Per-column drift between two snapshots of the same relation →
    ``(column, n_rows_a, n_rows_b, n_nulls_a, n_nulls_b,
    null_rate_a, null_rate_b, null_rate_delta, n_distinct_a,
    n_distinct_b, min_a, min_b, max_a, max_b)`` — the schema-level
    data-ops check run before any value-level test (K-S, chi2): did a
    column silently go null-heavy, collapse its cardinality, or shift
    its range between yesterday's load and today's?

    Built on :func:`profile` (one aggregation pass per side, exact
    integer counts); every rate is a single exact division and the
    delta one subtraction, so the whole comparison replays exactly in
    SQL. The join is column-name-sized. Distribution-level drift
    belongs to ``ks_statistic``/``chi_squared`` — this operator is
    the cheap always-on tripwire in front of them.
    """
    cols = columns or [c for c in df_a.columns if c in set(df_b.columns)]
    pa = profile(df_a, cols)
    pb = profile(df_b, cols)
    a = pa.select(
        "column",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_nulls").alias("n_nulls_a"),
        F.col("n_distinct").alias("n_distinct_a"),
        F.col("min_num").alias("min_a"),
        F.col("max_num").alias("max_a"),
    )
    b = pb.select(
        "column",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_nulls").alias("n_nulls_b"),
        F.col("n_distinct").alias("n_distinct_b"),
        F.col("min_num").alias("min_b"),
        F.col("max_num").alias("max_b"),
    )
    ra = F.col("n_nulls_a").cast("double") / F.col("n_rows_a").cast("double")
    rb = F.col("n_nulls_b").cast("double") / F.col("n_rows_b").cast("double")
    return a.join(b, "column").select(
        "column",
        "n_rows_a", "n_rows_b",
        "n_nulls_a", "n_nulls_b",
        ra.alias("null_rate_a"),
        rb.alias("null_rate_b"),
        (rb - ra).alias("null_rate_delta"),
        "n_distinct_a", "n_distinct_b",
        "min_a", "min_b", "max_a", "max_b",
    )
