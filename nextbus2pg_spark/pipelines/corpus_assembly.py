"""Corpus-assembly endgame — the composition a pretraining-data user
actually runs once curation is done: near-dup dedup → token-budget
mixture → leakage-safe train/test split → epoch shuffle → shard
export. Every stage exists as a tested operator
(operators/curation.py, operators/components.py); this module pins the
COMPOSITION contracts, which are where real pipelines go wrong:

- **budgets are computed AFTER dedup** — mixture thresholds derive
  from the deduplicated per-source token totals, so duplicate tokens
  can neither eat the budget nor skew the mixture toward dup-heavy
  sources;
- **the split is leakage-safe against the PRE-dedup edge set** — the
  surviving representative hashes on its component id, so it lands on
  the same side its dropped near-twins would have (re-ingesting a
  dropped twin later cannot straddle the split);
- **the split is stable across epochs** — the epoch seeds only the
  shuffle/shard hash (a different salt family), never the split hash,
  so epoch 2 reshuffles training order without moving a single row
  between train and test;
- **one component iteration** — the same ``connected_components``
  frame drives both the dedup drop-list and the split grouping.

Scale shape: the whole composition adds exactly one bounded aggregate
(the mixture totals), one join against the component relation, and
map-side hash columns on top of the corpus scan — no stage introduces
a corpus-sized shuffle; the only full shuffle is the final
one-per-shard export repartition, which is the deliverable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nextbus2pg_spark.operators.components import (
    connected_components,
    dedup_corpus,
)
from nextbus2pg_spark.operators.curation import (
    epoch_shuffle,
    leakage_safe_split,
    token_budget_mixture,
)


def assemble_corpus(
    docs: DataFrame,
    edges: DataFrame,
    weights: dict[str, int],
    token_budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    token_col: str = "n_tokens",
    test_percent: int = 10,
    epoch: int = 0,
    n_shards: int = 16,
) -> DataFrame:
    """Run the full assembly over ``docs`` given verified near-dup
    ``edges`` (e.g. ``minhash_lsh_pairs`` output at the chosen
    threshold). Returns the input columns plus ``split``
    ('train'/'test'), ``shuffle_key`` (the epoch's deterministic
    order key) and ``shard`` — ready for :func:`write_shards`.

    Rows dropped: non-representative near-duplicates (dedup) and rows
    hash-sampled away by the mixture (sources absent from ``weights``
    drop entirely). Same (docs, edges, weights, budget, epoch) in ⇒
    bit-identical frame out, on any partitioning or retry.
    """
    comp = connected_components(edges)
    deduped = dedup_corpus(docs, id_col, comp)
    mixed = token_budget_mixture(
        deduped, source_col, token_col, weights, token_budget,
        key_cols=[id_col],
    )
    split = leakage_safe_split(
        mixed, id_col, edges=None, test_percent=test_percent,
        components=comp,
    )
    return epoch_shuffle(split, [id_col], epoch=epoch, n_shards=n_shards)


def write_shards(
    assembled: DataFrame,
    path: str,
    split_value: str = "train",
    order_col: str = "shuffle_key",
    shard_col: str = "shard",
    split_col: str = "split",
) -> None:
    """Export one side of the split as sorted shards — the WebDataset
    shape: ``repartition(shard)`` routes every row of a shard to ONE
    task (hash partitioning on the shard key), ``sortWithinPartitions``
    orders it by the epoch's shuffle key, and ``partitionBy`` lands it
    as ``shard=N/`` directories of exactly one sorted file each. No
    global sort ever runs; readers stream shards independently.

    The within-partition sort leads with ``shard_col``: the dynamic-
    partition writer REQUIRES child ordering on the partition columns
    and would otherwise insert its own (non-stable) sort on shard,
    destroying the shuffle-key order inside each file."""
    (
        assembled.where(F.col(split_col) == split_value)
        .repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, order_col)
        .write.partitionBy(shard_col)
        .mode("error")
        .parquet(path)
    )


def assembly_report(
    assembled: DataFrame,
    source_col: str = "source",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Per-(source, split, shard) document and token counts over the
    assembled frame — the audit a data lead reads before a run:
    realized mixture vs target, split fractions, shard balance. One
    partial-aggregatable hash aggregate."""
    return assembled.groupBy(source_col, "split", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
    )
