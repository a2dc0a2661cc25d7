"""Streaming SCD Type-2 sink: CDC micro-batches → versioned dimension
history.

The reference's daily dimension refresh overwrites in place
(``agency.py:60-71``) and separately re-snapshots the one table whose
history matters (``sql/create_tables.sql:91-92``). This sink unifies
both: every micro-batch of dimension updates is merged into an SCD2
history table (``operators/scd2.scd2_merge``), so the current version
is one filter away (``valid_to IS NULL``) and every prior version
stays queryable (``scd2_as_of``).

Scale/processing notes:

- The merge joins only the OPEN slice of the history with the batch —
  closed rows never shuffle (see operators/scd2.py).
- State storage is the same rename-swap parquet pattern as
  ``ParquetUpsertTable`` — the local stand-in for a transactional
  MERGE target (MIGRATION.md maps it to Delta).
- Replays are harmless: re-applying a batch whose changes are already
  in the history is a no-op (idempotent merge), which is exactly the
  at-least-once contract ``foreachBatch`` requires.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nextbus2pg_spark.operators.dedup import exact_dedup
from nextbus2pg_spark.operators.scd2 import scd2_bootstrap, scd2_merge


class Scd2Table:
    """Parquet-backed SCD2 history table with rename-swap writes."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        tracked: Sequence[str],
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.tracked = list(tracked)

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def current(self) -> DataFrame:
        """The open version of every key."""
        return self.read().where(F.col("valid_to").isNull())

    def _write_state(self, df: DataFrame) -> None:
        # Same swap discipline as ParquetUpsertTable._write_state: the
        # merged plan reads self.path, so land the new state elsewhere
        # and swap via FileSystem renames (works on local FS and HDFS).
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        Path = jvm.org.apache.hadoop.fs.Path
        dst = Path(self.path)
        fs = dst.getFileSystem(hconf)
        tmp = Path(self.path + ".tmp")
        old = Path(self.path + ".old")
        df.write.mode("overwrite").parquet(self.path + ".tmp")
        if fs.exists(old):
            fs.delete(old, True)
        if fs.exists(dst):  # absent on bootstrap
            fs.rename(dst, old)
        fs.rename(tmp, dst)
        fs.delete(old, True)

    def apply(self, batch: DataFrame, batch_date) -> None:
        """Merge one snapshot/CDC batch (deduped per key first — the
        reference's within-batch dedup contract, ``agency.py:307-310``;
        last-writer-wins inside a batch is not meaningful for a
        snapshot, so the deterministic keeper is fine)."""
        batch = exact_dedup(
            batch.select(self.key, *self.tracked), [self.key]
        )
        if not self.exists():
            self._write_state(
                scd2_bootstrap(batch, self.key, self.tracked, batch_date)
            )
            return
        merged = scd2_merge(
            self.read(), batch, self.key, self.tracked, batch_date
        )
        self._write_state(merged)


def scd2_foreach_batch(
    table: Scd2Table,
    batch_date_fn: Callable[[int, DataFrame], Any],
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` adapter: merge each micro-batch into the SCD2
    history. ``batch_date_fn(batch_id, batch_df)`` supplies the
    effective date of the batch (wall clock, an event-time max, or a
    deterministic function of ``batch_id`` for tests — the reference's
    injectable-clock stance, ``run.py:103-111``). Empty batches are
    skipped (T7)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.apply(batch_df, batch_date_fn(batch_id, batch_df))

    return write
