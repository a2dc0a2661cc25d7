"""Z-order layout: interleave correctness and the data-skipping payoff
(per-partition min/max ranges tighten on BOTH columns vs a hash
layout — per-partition ranges become per-file stats on write)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nextbus2pg_spark.operators.layout import (
    morton_interleave,
    quantize,
    zorder_layout,
)


def _py_morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_matches_reference_bits(spark):
    df = spark.range(300).select(
        (F.col("id") % 17).alias("x"), (F.col("id") % 23).alias("y"), "id"
    )
    got = df.select(
        "x", "y", morton_interleave(["x", "y"], bits=5).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_morton(r.x, r.y, 5), r


def test_morton_guards(spark):
    with pytest.raises(ValueError, match=">= 2"):
        morton_interleave(["x"], bits=8)
    with pytest.raises(ValueError, match="exceeds"):
        morton_interleave(["x", "y"], bits=32)


def test_quantize_bounds(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (250.0,)], "v double"
    ).select(quantize("v", 0.0, 100.0, bits=4).alias("q"))
    vals = [r.q for r in df.collect()]
    assert vals == [0, 0, 8, 15, 15]  # clamped into [0, 16)


def _avg_partition_range(df, col):
    """Mean (max-min) of `col` per partition — the proxy for per-file
    min/max stats width after a write."""
    stats = (
        df.withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .agg((F.max(col) - F.min(col)).alias("w"))
        .agg(F.avg("w"))
        .collect()[0][0]
    )
    return stats


def test_zorder_tightens_minmax_on_both_columns(spark):
    # A 64x64 grid visited in row-major order: a naive range sort by x
    # leaves y's per-partition range at the full domain.
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 2654435761) % 64).alias("y"),  # scrambled order
    )
    z = zorder_layout(grid, ["x", "y"], bits=6, num_partitions=16)
    assert z.count() == 64 * 64  # layout is a pure reshuffle

    zx, zy = _avg_partition_range(z, "x"), _avg_partition_range(z, "y")
    hashed = grid.repartition(16)
    hx, hy = _avg_partition_range(hashed, "x"), _avg_partition_range(hashed, "y")
    # Hash layout: every partition spans ~the full 0..63 domain on both
    # axes. Z-order layout: each partition covers a compact tile, so the
    # average range shrinks on BOTH columns at once.
    assert zx < hx / 2, (zx, hx)
    assert zy < hy / 2, (zy, hy)
