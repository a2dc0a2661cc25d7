"""nextbus2pg_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL pipeline
(XtremeCurling/nextbus2pg), re-expressed Spark-first.

The reference (see /root/repo/SURVEY.md) is a continuous NextBus-XML →
Postgres ingest loop; its query semantics are upserts on business keys,
broadcast-style dict joins, anti-join set differences, deterministic
top-1-per-key picks, within-batch dedup and incremental offset fetches.
This package maps each of those onto DataFrame/SQL primitives (Catalyst
optimizes; no custom rules needed — SURVEY.md §4) and adds the
training-data-pipeline surface (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout
------
- ``session``   : SparkSession factory with engine defaults (AQE, UTC, Arrow).
- ``catalog``   : test-fixture table loaders (handles ns-timestamp parquet).
- ``functions`` : scalar expression library (SURVEY.md §2.9).
- ``operators`` : keyed writes, joins, dedup, similarity, text ops
                  (SURVEY.md §2.2-2.8, §2.12).
- ``plans``     : the fixture-query plan builders + DuckDB oracle SQL.
- ``streaming`` : Structured Streaming ingest pipeline (SURVEY.md §2.10).
- ``sinks``     : JDBC/parquet upsert sinks (foreachBatch; SURVEY.md §4).
- ``sources``   : feed adapters (NextBus-shaped XML → rows).
"""

__version__ = "0.1.0"
