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


def _normalize_events(df: DataFrame) -> DataFrame:
    """Normalize the ``events`` time column to one downstream schema.

    The driver has generated two physical encodings across rounds:

    - INT64 TIMESTAMP(NANOS, isAdjustedToUTC=false), which Spark's reader
      only accepts as a raw long (``nanosAsLong``) — ``ts`` arrives as
      ``bigint`` epoch-nanoseconds;
    - plain TIMESTAMP(MICROS), which Spark reads natively as
      ``timestamp_ntz``.

    Either way downstream plans see:

    - ``ts``: ``timestamp_ntz`` at µs precision, identical to what DuckDB
      exposes for the same file (DuckDB also coerces ns→µs in its view),
    - ``ts_us``: epoch-microsecond long (exact: integer ``div`` /
      ``unix_micros``, never double division — 1.7e18 ns exceeds the 2^53
      double mantissa),
    - ``ts_ns``: epoch-nanosecond long (raw when the file is ns; µs·1000
      when the file has no sub-µs precision to preserve).
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return (
            df.withColumn("ts_ns", F.col("ts"))
            .withColumn("ts_us", F.expr("ts div 1000").cast("long"))
            .withColumn(
                "ts",
                F.timestamp_micros(F.col("ts_us")).cast("timestamp_ntz"),
            )
        )
    # Session tz is pinned UTC, so ntz→timestamp→unix_micros is exact.
    return (
        df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn("ts_ns", F.col("ts_us") * F.lit(1000))
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes the events time encoding
    (see :func:`_normalize_events`)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_events(df)
    return df


def events_after(spark: SparkSession, sf_dir: str, offset_us: int) -> DataFrame:
    """Incremental events scan: rows strictly after an epoch-µs offset.

    The offset predicate is applied to the PHYSICAL time column *before*
    the normalization projection, in the column's native type, so it
    reaches the parquet reader as a pushed filter (a predicate on the
    derived ``ts_us`` expression would not push). This is the batch
    analogue of the streaming source offset (``route.py:151-155``).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.where(F.col("ts") > F.lit(offset_us * 1000))
    else:
        cutoff = F.timestamp_micros(F.lit(offset_us)).cast("timestamp_ntz")
        raw = raw.where(F.col("ts") > cutoff)
    return _normalize_events(raw)


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
