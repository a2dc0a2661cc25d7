"""SCD Type-2 merge semantics: change/close/insert fates, idempotent
re-apply, and point-in-time reads."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nextbus2pg_spark.operators.scd2 import (
    scd2_as_of,
    scd2_bootstrap,
    scd2_merge,
)

D1 = dt.date(2024, 1, 1)
D2 = dt.date(2024, 6, 1)
D3 = dt.date(2024, 9, 1)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, name string, bal double")


def test_merge_fates(spark):
    hist = scd2_bootstrap(
        _snap(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0)]),
        key="k", tracked=["name", "bal"], batch_date=D1,
    )
    out = scd2_merge(
        hist,
        # 1 changed, 2 absent (stays open), 3 unchanged (null-safe), 4 new
        _snap(spark, [(1, "a2", 1.0), (3, None, 3.0), (4, "d", 4.0)]),
        key="k", tracked=["name", "bal"], batch_date=D2,
    )
    rows = {(r.k, r.valid_from, r.valid_to): (r.name, r.bal) for r in out.collect()}
    assert rows == {
        (1, D1, D2): ("a", 1.0),     # closed old version
        (1, D2, None): ("a2", 1.0),  # new open version
        (2, D1, None): ("b", 2.0),   # absent from batch: stays open
        (3, D1, None): (None, 3.0),  # unchanged (NULL-safe compare)
        (4, D2, None): ("d", 4.0),   # brand-new key
    }


def test_idempotent_reapply_and_as_of(spark):
    hist = scd2_bootstrap(
        _snap(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
        key="k", tracked=["name", "bal"], batch_date=D1,
    )
    snap2 = _snap(spark, [(1, "a2", 1.0), (2, "b", 2.0)])
    once = scd2_merge(hist, snap2, key="k", tracked=["name", "bal"], batch_date=D2)
    twice = scd2_merge(once, snap2, key="k", tracked=["name", "bal"], batch_date=D3)
    # Re-applying the same snapshot is a no-op (no new versions).
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

    # Point-in-time reads see the version live at that date.
    before = {r.k: r.name for r in scd2_as_of(once, D1).collect()}
    after = {r.k: r.name for r in scd2_as_of(once, D2).collect()}
    assert before == {1: "a", 2: "b"}
    assert after == {1: "a2", 2: "b"}
    # Exactly one open row per live key.
    open_counts = (
        once.where(F.col("valid_to").isNull()).groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)
