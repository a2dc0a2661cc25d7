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


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 13,
    broadcast_eval: bool = True,
    doc_shingles: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: count, per training document, the
    distinct word ``ngram``-grams it shares with an eval/benchmark
    corpus (the GPT-3-style 13-gram overlap test; the fixture uses
    n=3 so the synthetic corpus actually collides).

    Scale shape: the eval side reduces to a DISTINCT shingle set —
    benchmark suites are bounded by construction (thousands of
    documents, not the corpus), so ``broadcast_eval`` defaults to a
    broadcast semi-structured join and the training corpus NEVER
    shuffles: shingle explode + broadcast hash join + partial-agg
    count, all map-side. Set it False if the "eval" side is actually
    large and let AQE decide.

    Output: (id, n_hits) for contaminated documents only — the join
    is the filter; clean documents produce no shingle match and are
    absent (callers left-anti-join to drop flagged docs).

    ``doc_shingles``: a precomputed ``(id, shingle)`` relation for the
    TRAIN side at the same ``ngram`` — a pipeline that already
    shingled the corpus (near-dup dedup) shares it here instead of
    tokenizing twice; it is restricted to ``docs``'s ids with a semi
    join (the provided relation may cover a superset of ``docs``).
    """
    from nextbus2pg_spark.operators.dedup import word_shingles

    if doc_shingles is not None:
        doc_sh = doc_shingles.join(
            docs.select(F.col(id_col).alias("id")), "id", "left_semi"
        ).distinct()
    else:
        doc_sh = word_shingles(docs, id_col, text_col, n=ngram).distinct()
    eval_sh = (
        word_shingles(eval_docs, id_col, text_col, n=ngram)
        .select("shingle")
        .distinct()
    )
    if broadcast_eval:
        eval_sh = F.broadcast(eval_sh)
    return (
        doc_sh.join(eval_sh, "shingle", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    chunk_col: str = "chunk_id",
    offset_col: str = "start_offset",
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end-to-end in a
    deterministic order and cut the token stream every ``budget``
    tokens — each document is assigned the training chunk where it
    STARTS (the standard concatenate-then-chunk LLM batching layout;
    documents may straddle a boundary, the loader masks across it).

    Scale shape: one window sum per partition group. ``partition_cols``
    (e.g. language, or an explicit shard key) bounds every sort to one
    group — there is deliberately NO global-order variant, because a
    corpus-wide total order means a single range sort at 100 TB;
    callers wanting global chunk ids should pack per shard and offset
    by shard id downstream.

    Output adds ``offset_col`` (running token offset within the group)
    and ``chunk_col`` (``floor(offset / budget)``).
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("bigint")
    return df.withColumn(offset_col, start).withColumn(
        chunk_col, F.floor(F.col(offset_col) / budget)
    )


def quantile_threshold_filter(
    df: DataFrame,
    metric_col: str,
    group_cols: Sequence[str],
    q: float = 0.75,
    threshold_col: str = "threshold",
) -> DataFrame:
    """Keep rows at or above their group's exact ``q``-quantile of
    ``metric_col`` (e.g. top-quartile quality score per language).

    Scale shape: the quantile is computed by AGGREGATION (one row per
    group), then joined back — the threshold frame is bounded by
    |groups|, so the join broadcasts, and the corpus itself never
    window-sorts (a percent_rank window over the corpus would shuffle
    and rank every row; this shuffles only the aggregation). Swap
    ``F.percentile`` for ``F.approx_percentile`` at extreme scale to
    avoid holding per-group sorted buffers.

    Output keeps all input columns plus ``threshold_col``.
    """
    thr = df.groupBy(*group_cols).agg(
        F.percentile(metric_col, F.lit(q)).alias(threshold_col)
    )
    return df.join(F.broadcast(thr), list(group_cols)).where(
        F.col(metric_col) >= F.col(threshold_col)
    )


def winsorize(
    df: DataFrame,
    metric_col: str,
    group_cols: Sequence[str],
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Cap ``metric_col`` at its group's [p_lo, p_hi] quantiles —
    outlier clamping before loss-weighting / normalization, without
    dropping rows (the filter-flavored sibling is
    ``quantile_threshold_filter``).

    Same scale shape as the threshold filter: per-group bounds by
    AGGREGATION (one row per group, broadcast back); the corpus never
    window-sorts. Output keeps all input columns plus the clamped value
    in ``out_col`` (default ``<metric_col>_w``).
    """
    out = out_col or f"{metric_col}_w"
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(metric_col, F.lit(p_lo)).alias("__lo"),
        F.percentile(metric_col, F.lit(p_hi)).alias("__hi"),
    )
    joined = (
        df.join(F.broadcast(bounds), list(group_cols))
        if group_cols
        else df.crossJoin(F.broadcast(bounds))
    )
    return joined.withColumn(
        out,
        F.least(F.greatest(F.col(metric_col), F.col("__lo")), F.col("__hi")),
    ).drop("__lo", "__hi")
