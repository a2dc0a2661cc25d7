"""Fixture-table catalog: schema-stable loaders over /root/testdata parquet.

Mirrors the reference's fixed-DDL stance (no schema inference —
``/root/reference/sql/create_tables.sql:15-125``): every load returns a
known schema, and the one irregular physical encoding (the ``events``
table is parquet TIMESTAMP(NANOS), which Spark's reader rejects) is
normalized here, once, so every downstream plan sees a clean
``timestamp_ntz`` event-time column.

Scale note: loaders keep everything lazy — a plain ``spark.read.parquet``
so filter/column pushdown reaches the scan (check ``PushedFilters`` /
``ReadSchema`` in ``.explain``). Only the ns→µs projection is added for
``events``; it is a cheap map-side expression that does not break
pushdown of filters on the other columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: All driver-generated tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes the events ns-timestamp.

    For ``events`` the parquet physical type is INT64 TIMESTAMP(NANOS,
    isAdjustedToUTC=false). We read it as a raw long (``nanosAsLong``)
    and derive:

    - ``ts_ns``: the raw epoch-nanosecond long, kept so incremental scans
      can filter on a *physical* column (the predicate pushes to the
      parquet reader — derived-expression filters would not),
    - ``ts_us``: epoch microseconds (exact: integer ``div``, never double
      division — 1.7e18 ns exceeds the 2^53 double mantissa),
    - ``ts``: ``timestamp_ntz`` at µs precision, identical to what DuckDB
      exposes for the same file (DuckDB coerces ns→µs in its view).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = (
            df.withColumn("ts_ns", F.col("ts"))
            .withColumn("ts_us", F.expr("ts div 1000").cast("long"))
            .withColumn(
                "ts",
                F.timestamp_micros(F.col("ts_us")).cast("timestamp_ntz"),
            )
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table (lazy; nothing is scanned yet)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the fixture tables as SQL temp views (for spark.sql plans)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def sql(spark: SparkSession, query: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """SQL-string entry point: register the fixture tables as temp views
    and run ``spark.sql(query)`` — the engine's parser/optimizer IS
    Spark's (SURVEY.md §7 'explicitly not built'). Example:

        sql(spark, "SELECT count(*) FROM lineitem WHERE l_quantity > 45")
    """
    register_temp_views(spark, sf_dir)
    return spark.sql(query)
