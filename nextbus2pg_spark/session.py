"""SparkSession factory with the engine's defaults.

Scale stance (SURVEY.md §4, BASELINE.json): we run tests on ``local[N]``
but configure as for a many-executor cluster — AQE on (runtime join
strategy + skew-join + partition coalescing), explicit shuffle
parallelism, Arrow for any pandas exchange, UTC session time so
event-time semantics are zone-stable.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

#: Runtime-settable SQL confs every entry point applies, so the engine
#: behaves identically under a driver-provided SparkSession (the
#: correctness harness builds its own session; these are all
#: runtime-settable SQLConf keys).
RUNTIME_CONFS: dict[str, str] = {
    # The driver's synthetic events table is parquet TIMESTAMP(NANOS),
    # which Spark's vectorized reader rejects; read as long (ns) and
    # convert in catalog.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive-UTC timestamps end-to-end (reference convention: SURVEY.md
    # §1.2 — datetime.utcnow, utcfromtimestamp).
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime broadcast conversion, skew-join splitting, post-shuffle
    # partition coalescing — the scale levers SURVEY.md §4 delegates to.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an externally built session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf pinned by the host (e.g. static conf) — keep going; the
            # engine degrades gracefully (only events-table reads need
            # nanosAsLong, and catalog.load_table re-asserts it).
            pass
    return spark


def get_spark(app_name: str = "nextbus2pg_spark") -> SparkSession:
    """Build (or reuse) a session sized for the local test harness.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    shuffle partitions match it so small-SF runs don't schedule hundreds
    of empty tasks, while cluster deploys would override via spark-submit.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    # Hermetic warehouse: saveAsTable state (bucketed tables) lives in a
    # per-process temp dir, never a `spark-warehouse/` in the CWD — a
    # killed run otherwise leaves a directory the next session's catalog
    # doesn't know about, and every later saveAsTable dies with
    # LOCATION_ALREADY_EXISTS. Static conf, so it must be set pre-build.
    warehouse = os.environ.get("SPARK_GRAFT_WAREHOUSE") or tempfile.mkdtemp(
        prefix="spark-warehouse-"
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "4g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
