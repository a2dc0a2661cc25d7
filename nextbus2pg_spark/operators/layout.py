"""Data-layout clustering: Z-order (Morton) interleaving for
multi-column data skipping.

Why this exists at 100 TB: parquet/Delta scans prune row groups and
files by min/max statistics. A table sorted by one column skips
perfectly on that column and not at all on others; interleaving the
bits of several columns into one Morton key and range-partitioning by
it makes EVERY participating column's values locally clustered, so
min/max ranges stay tight on all of them — the standard multi-column
data-skipping layout (the same trick Delta's OPTIMIZE ZORDER BY
applies).

Everything is integer bit arithmetic built from ``shiftright``/``&``/
``<<``-equivalent JVM expressions — codegen'd, engine-portable, and
therefore oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Bit-interleave k non-negative integer columns into one Z-value.

    Column *j*'s bit *i* lands at output position ``i*k + j``. With
    ``bits`` per column the result needs ``bits*k ≤ 63`` bits — enforced
    so the value stays a non-negative long. Inputs are masked to
    ``bits`` (callers quantize/rank wider domains first, see
    ``quantize``).
    """
    k = len(cols)
    if k < 2:
        raise ValueError("interleave needs >= 2 columns")
    if bits * k > 63:
        raise ValueError(f"bits*cols = {bits * k} exceeds a signed long")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    out = F.lit(0).cast("long")
    for j, c in enumerate(cs):
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, i * k + j)
    return out


def quantize(col: Column | str, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into ``[0, 2**bits)`` by linear scaling —
    the cheap stand-in for rank-based quantization when the domain is
    known. Values are clamped to the range."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    n = float(2**bits)
    scaled = F.floor((c - F.lit(lo)) / F.lit(hi - lo) * F.lit(n)).cast("long")
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(int(n) - 1))


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster a frame for multi-column data skipping: compute the
    Morton key over pre-quantized integer columns, range-partition by
    it (contiguous key ranges per output file) and sort within
    partitions. Written out, every participating column has tight
    min/max per row group.

    This is a full shuffle + local sort — a one-off layout job, priced
    like any table OPTIMIZE; queries afterwards skip instead of scan.
    """
    z = morton_interleave(list(cols), bits=bits).alias("__z")
    keyed = df.withColumn("__z", z)
    parts = num_partitions or keyed.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
