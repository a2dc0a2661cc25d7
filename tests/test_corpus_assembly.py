"""Corpus-assembly endgame pipeline (pipelines/corpus_assembly.py):
the COMPOSITION contracts — budgets after dedup, split leakage-safe
and epoch-stable, one-file-per-shard sorted export."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from nextbus2pg_spark.operators.components import (
    connected_components,
    dedup_corpus,
)
from nextbus2pg_spark.operators.curation import (
    leakage_safe_split,
    token_budget_mixture,
)
from nextbus2pg_spark.pipelines.corpus_assembly import (
    assemble_corpus,
    assembly_report,
    write_shards,
)

WEIGHTS = {"web": 3, "books": 1}
BUDGET = 2_000


def _corpus(spark):
    # 3 sources; 'code' is unweighted (must drop). Components:
    # {1,2,3} and {10,11} — only the min id survives dedup.
    rows = [
        (i, "web" if i % 3 else "books", 40 + i) for i in range(1, 61)
    ] + [(100 + i, "code", 50) for i in range(5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    return docs, edges


def test_assembly_composition_order_is_pinned(spark):
    """The assembled frame equals dedup → mixture(deduped totals) →
    leakage-split → shuffle chained explicitly — i.e. the budget is
    provably computed AFTER dedup and the split runs on the mixed
    rows; unweighted sources and non-representative near-dups are
    gone."""
    docs, edges = _corpus(spark)
    out = assemble_corpus(
        docs, edges, WEIGHTS, BUDGET, epoch=1, n_shards=4
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert not {2, 3, 11} & set(got), "near-dup non-representatives"
    assert all(r["source"] != "code" for r in got.values())

    comp = connected_components(edges)
    deduped = dedup_corpus(docs, "doc_id", comp)
    mixed = token_budget_mixture(
        deduped, "source", "n_tokens", WEIGHTS, BUDGET,
        key_cols=["doc_id"],
    )
    want_ids = {r["doc_id"] for r in mixed.collect()}
    assert set(got) == want_ids
    split = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(
            mixed, "doc_id", edges, components=comp
        ).collect()
    }
    assert {k: r["split"] for k, r in got.items()} == split
    # both sides materialize and kept tokens respect the budget shape:
    # every source's kept total is <= its target + one max-doc slack
    kept = (
        out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    )
    targets = {
        s: BUDGET * w // sum(WEIGHTS.values()) for s, w in WEIGHTS.items()
    }
    for r in kept:
        assert r["t"] <= targets[r["source"]] + 100, (r, targets)


def test_split_is_stable_across_epochs_and_leakage_safe(spark):
    """Epoch 1 → epoch 2 reshuffles order and shards but moves NO row
    between train and test; a surviving representative sits on the
    side its component hash dictates (where its dropped twins would
    have gone)."""
    docs, edges = _corpus(spark)
    e1 = assemble_corpus(docs, edges, WEIGHTS, BUDGET, epoch=1, n_shards=4)
    e2 = assemble_corpus(docs, edges, WEIGHTS, BUDGET, epoch=2, n_shards=4)
    m1 = {r["doc_id"]: r for r in e1.collect()}
    m2 = {r["doc_id"]: r for r in e2.collect()}
    assert set(m1) == set(m2)
    assert {k: v["split"] for k, v in m1.items()} == {
        k: v["split"] for k, v in m2.items()
    }
    assert any(
        m1[k]["shuffle_key"] != m2[k]["shuffle_key"] for k in m1
    ), "epoch must re-seed the order"

    # leakage safety through dedup: doc 1 (survivor of {1,2,3}) splits
    # by its component representative — identical to what doc 2 or 3
    # would have gotten had they survived instead
    full_split = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, "doc_id", edges).collect()
    }
    assert len({full_split[i] for i in (1, 2, 3)}) == 1
    if 1 in m1:
        assert m1[1]["split"] == full_split[1]


def test_write_shards_one_sorted_file_per_shard(spark, tmp_path):
    """Train export: shard=N directories with exactly ONE parquet file
    each, rows sorted by shuffle_key inside, union == the train side."""
    docs, edges = _corpus(spark)
    out = assemble_corpus(docs, edges, WEIGHTS, BUDGET, epoch=1, n_shards=4)
    path = str(tmp_path / "shards")
    write_shards(out, path)

    train = {r["doc_id"] for r in out.where("split = 'train'").collect()}
    seen = set()
    shard_dirs = glob.glob(f"{path}/shard=*")
    assert shard_dirs
    for d in shard_dirs:
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) == 1, (d, files)
        t = pq.read_table(files[0])
        keys = t.column("shuffle_key").to_pylist()
        assert keys == sorted(keys), d
        seen |= set(t.column("doc_id").to_pylist())
    assert seen == train


def test_assembly_report_sums_match(spark):
    docs, edges = _corpus(spark)
    out = assemble_corpus(docs, edges, WEIGHTS, BUDGET, epoch=1, n_shards=4)
    rep = assembly_report(out).collect()
    assert sum(r["n_docs"] for r in rep) == out.count()
    by_src = {}
    for r in rep:
        by_src[r["source"]] = by_src.get(r["source"], 0) + r["n_tokens"]
    want = {
        r["source"]: r["t"]
        for r in out.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert by_src == want
