"""End-to-end curation pipeline: one lazy plan, observed stage
counters, deterministic output."""

from __future__ import annotations

from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.pipelines.curate import curate_documents

SF = "/root/testdata/sf0.001"


def test_curate_end_to_end_with_metrics(spark):
    docs = load_table(spark, SF, "documents")
    # a tiny "benchmark" corpus: 5 docs lifted from the corpus itself,
    # guaranteeing decontamination hits
    eval_docs = docs.orderBy("doc_id").limit(5)

    out, obs = curate_documents(
        docs,
        eval_docs=eval_docs,
        min_quality=0.2,
        decontam_ngram=3,
        pack_budget=512,
    )
    rows = out.collect()  # single action fills every observation
    m = {k: o.get["n"] for k, o in obs.items()}

    # monotone survivor counts, every stage observed
    assert list(m) == [
        "input", "quality_lang", "exact_dedup", "near_dedup",
        "decontaminated",
    ]
    assert m["input"] >= m["quality_lang"] >= m["exact_dedup"]
    assert m["exact_dedup"] >= m["near_dedup"] >= m["decontaminated"]
    assert m["input"] == docs.count()
    # the sf0.001 corpus has no exact-text duplicates (500 distinct of
    # 500), so the drops land in near-dup and decontamination
    assert m["near_dedup"] < m["exact_dedup"]
    assert m["decontaminated"] < m["near_dedup"]
    assert len(rows) == m["decontaminated"]

    # packing assigned every surviving doc a chunk, contiguous from 0
    # within each language shard
    chunks = {(r.lang, r.chunk_id) for r in rows}
    for lang in {c[0] for c in chunks}:
        ids = sorted(c[1] for c in chunks if c[0] == lang)
        assert ids[0] == 0 and ids == list(range(len(ids)))

    # retry-stability: the same pipeline yields the same rows
    out2, _ = curate_documents(
        docs, eval_docs=eval_docs, min_quality=0.2,
        decontam_ngram=3, pack_budget=512,
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out2.collect()))


def test_curate_minimal_stages(spark):
    docs = load_table(spark, SF, "documents")
    out, obs = curate_documents(docs, pack_budget=None)
    n = out.count()
    assert n == obs["near_dedup"].get["n"]
    assert "decontaminated" not in obs and "sampled" not in obs
    # no packing columns when disabled
    assert "chunk_id" not in out.columns
