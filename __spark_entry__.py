"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §7 milestone 0) on
sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
fixture query from SURVEY.md §2 plus the north-star extensions
(§2.12), backed by the ``nextbus2pg_spark`` package.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nextbus2pg_spark.plans import ORACLE, QUERIES
from nextbus2pg_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    "Latest position per vehicle per service, enriched with dims" — the
    reference's hot path (agency.py:239-324) as one batch plan:
    scan → event-time → dedup (A2) → broadcast dim join (J2) →
    deterministic top-1 (J5/W2).
    """
    apply_runtime_confs(spark)
    return QUERIES["q_flagship_latest"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.12."""

    def with_confs(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: with_confs(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query. Keys absent here are exactly the
    explicitly-declared ``nextbus2pg_spark.plans.ROWS_ONLY`` set —
    EMPTY since round 6: every registered query (including the
    Lloyd-trained ANN pipelines, via deterministic fold-mean training)
    carries a full value-hash oracle."""
    return dict(ORACLE)
