"""Dataset-curation operators — deterministic sampling, train/test
splits, per-group caps, stratified sampling (BASELINE.json north-star:
the selection half of a training-data pipeline; the reference itself
has no sampling surface).

Everything here is **deterministic by content hash**, never by RNG:

- reproducible across runs, engines, partitionings, and retries (a
  task retry resamples identically; ``rand()``-based sampling does
  not survive any of those),
- stable under data growth: a document keeps or loses membership based
  only on its own key, so incremental pipelines never churn previously
  selected rows,
- oracle-checkable (the md5-prefix bucket is portable ANSI SQL).

Scale shape: each operator is a map-side filter/projection on a hash
expression — no shuffle at all except ``cap_per_group``'s single
window sort, which shuffles only on the group key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Buckets for percentage semantics: hash_bucket() ∈ [0, 100).
N_BUCKETS = 100


def hash_bucket(
    *key_cols: Column | str, n_buckets: int = N_BUCKETS, salt: str = ""
) -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from the row key.

    First 8 hex chars of md5 (32 bits — exact in a BIGINT, and far
    below the 2^53 double-mantissa portability bound), mod n_buckets.
    ``salt`` decorrelates independent decisions made from the same key
    (e.g. sample-then-split must not reuse one bucket stream).
    """
    cols = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
            for c in key_cols]
    h = F.md5(F.concat_ws(":", F.lit(salt), *cols))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(n_buckets)
    )


def deterministic_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    percent: int,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``percent``% of rows, chosen by key hash (map-side filter,
    no shuffle; reproducible and retry-stable)."""
    return df.where(hash_bucket(*key_cols, salt=salt) < F.lit(percent))


def train_test_split(
    df: DataFrame,
    key_cols: Sequence[str],
    test_percent: int = 10,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Label every row 'train'/'test' by key hash. Disjoint and
    exhaustive by construction; membership of a row never changes as
    the dataset grows (hash depends only on the row's own key)."""
    return df.withColumn(
        out_col,
        F.when(
            hash_bucket(*key_cols, salt=salt) < F.lit(test_percent), "test"
        ).otherwise("train"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    percents: dict[str, int],
    default_percent: int = 0,
    key_cols: Sequence[str] | None = None,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downsample the dominant
    language, keep the tail): ``percents`` maps stratum value →
    percent kept; unlisted strata get ``default_percent``.

    Still a pure map-side filter — the per-stratum threshold is a CASE
    expression, not a join.
    """
    keys = list(key_cols) if key_cols else [strata_col]
    threshold: Column = F.lit(default_percent)
    for value, pct in sorted(percents.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(pct)
        ).otherwise(threshold)
    return df.where(hash_bucket(*keys, salt=salt) < threshold)


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    n: int,
) -> DataFrame:
    """Keep at most ``n`` rows per group, by an explicit deterministic
    priority order (e.g. longest documents per domain). The one
    shuffle is on the group key; the sort is per-group.

    For top-1, prefer ``min_by``/``max_by`` aggregation (PERF.md scale
    rule 2); the window form is for n > 1 where ranking is required.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )
