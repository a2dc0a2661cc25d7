"""Exact-arithmetic statistics over quantized numeric columns —
grouped Pearson correlation and OLS slope (north-star surface: the
reference computes no statistics; profiling a 100 TB fact table for
feature relationships is a one-pass aggregation problem and belongs
in the engine, not in a sampled notebook).

Determinism recipe (the BM25/rolling-anomaly one): quantize each
input to an exact integer (``round(value * scale)``), accumulate the
five moment sums as DECIMAL(38,0) — Spark's exact 128-bit decimal
aggregation, matching DuckDB's HUGEINT sums — and only at the very
end combine them in ONE fixed double expression (two casts, two
sqrts, one division). Integer sums are order-independent, so the
result is identical under any partitioning and any engine; there is
no FP accumulation anywhere.

Scale shape: one map-side-partial hash aggregation (six accumulators
per group), nothing else — the textbook one-pass correlation. The
group count bounds the output, not the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def grouped_pearson(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    *,
    x_scale: int = 1,
    y_scale: int = 1,
) -> DataFrame:
    """Per-group Pearson r and OLS slope of y~x →
    ``(*group_cols, n, corr, slope)``.

    ``x_scale``/``y_scale`` quantize the inputs to integers
    (``round(v * scale)``) — pick them so the values ARE integers at
    that scale (quantities at 1, 2-dp money at 100); correlation is
    scale-invariant so r is unchanged, and the returned ``slope`` is
    in QUANTIZED units (slope of y*y_scale on x*x_scale).

    NULL in either column drops the row (pairwise-complete, the
    standard semantics). Zero variance in x or y yields NULL corr and
    slope (decided by an exact integer comparison, never a 0/0).

    Overflow bound: ``n * max|x*scale| * max|y*scale|`` and
    ``n * max(v*scale)^2`` must stay under 10^38 (DECIMAL(38) /
    HUGEINT) — comfortable for any real fact table: 10^12 rows of
    6-figure cent values is ~10^34.
    """
    x = F.round(F.col(x_col) * F.lit(x_scale), 0).cast("long")
    y = F.round(F.col(y_col) * F.lit(y_scale), 0).cast("long")
    base = df.select(
        *group_cols, x.alias("__x"), y.alias("__y")
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    xd, yd = F.col("__x").cast(_DEC), F.col("__y").cast(_DEC)
    a = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    nd = F.col("n").cast(_DEC)
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return a.select(
        *group_cols,
        "n",
        F.when(
            (denx > 0) & (deny > 0),
            num.cast("double")
            / (F.sqrt(denx.cast("double")) * F.sqrt(deny.cast("double"))),
        ).alias("corr"),
        F.when(
            denx > 0, num.cast("double") / denx.cast("double")
        ).alias("slope"),
    )


def chi_squared(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Chi-squared test of independence between two categorical
    columns → one row ``(chi2, dof, n)``.

    Observed counts are exact integers from one hash aggregation over
    the fact table; every later relation (cells, row totals, column
    totals) is CONTINGENCY-TABLE-sized, not data-sized. Expected
    counts ``e = r*c/n`` and the per-cell terms ``(o-e)^2/e`` are
    fixed double expressions over those exact integers, and the chi2
    total is a left fold over the (a, b)-sorted cell list — bounded
    by the table's cardinality product, deterministic under any
    partitioning, and bit-replayable by a DuckDB ``list_reduce``.

    NULL categories drop the row (a NULL level would silently absorb
    mass from every real level). ``dof = (R-1)(C-1)``.
    """
    from nextbus2pg_spark.operators.graph import _sorted_fold

    base = df.select(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).where(F.col("a").isNotNull() & F.col("b").isNotNull())
    observed = base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("obs"))
    # The statistic needs EVERY cell of the R x C grid — a level pair
    # that never co-occurs still contributes (0-e)^2/e. Rebuild the
    # full grid (contingency-sized cross join) and zero-fill.
    cells = (
        observed.select("a").distinct()
        .crossJoin(observed.select("b").distinct())
        .join(observed, ["a", "b"], "left")
        .select("a", "b", F.coalesce("obs", F.lit(0)).alias("o"))
    )
    rows_t = cells.groupBy("a").agg(F.sum("o").alias("ra"))
    cols_t = cells.groupBy("b").agg(F.sum("o").alias("cb"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct("a").alias("nr"),
        F.count_distinct("b").alias("nc"),
    )
    e = (
        F.col("ra").cast("double")
        * F.col("cb").cast("double")
        / F.col("n").cast("double")
    )
    od = F.col("o").cast("double")
    term = (od - e) * (od - e) / e
    scored = (
        cells.join(rows_t, "a")
        .join(cols_t, "b")
        .crossJoin(F.broadcast(tot))  # bounded: exactly 1 row
        .select("a", "b", "n", "nr", "nc", term.alias("t"))
    )
    return scored.groupBy("n", "nr", "nc").agg(
        _sorted_fold(F.struct("a", "b"), F.col("t")).alias("chi2")
    ).select(
        "chi2",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        F.col("n").cast("long").alias("n"),
    )
