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


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """FK assertion query: child rows whose key misses the parent
    (SURVEY.md §1.4 — Spark doesn't enforce FKs; this is the audit).
    Left-anti join: only unmatched rows flow, no row explosion."""
    p = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(F.broadcast(p), child_key, "left_anti")
