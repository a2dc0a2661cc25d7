"""Curation-operator invariants (beyond the oracle parity checks):
split disjoint/exhaustive, sampling stability under repartitioning
(the retry/partitioning-independence claim), cap bound + survivor
determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.operators import curation as cu
from tests.conftest import SF_DIR


def test_split_disjoint_and_exhaustive(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = cu.train_test_split(docs, ["doc_id"], test_percent=10)
    counts = dict(
        (r["split"], r["n"]) for r in
        out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert set(counts) == {"train", "test"}
    assert sum(counts.values()) == docs.count()
    # roughly 10% test (hash-uniformity; wide tolerance)
    frac = counts["test"] / sum(counts.values())
    assert 0.05 < frac < 0.15


def test_sample_invariant_under_partitioning(spark):
    """The sampled SET is identical no matter how the input is
    partitioned — the property rand()-sampling lacks."""
    docs = load_table(spark, SF_DIR, "documents")
    a = {r.doc_id for r in
         cu.deterministic_sample(docs, ["doc_id"], 20).select("doc_id").collect()}
    b = {r.doc_id for r in
         cu.deterministic_sample(docs.repartition(7), ["doc_id"], 20)
         .select("doc_id").collect()}
    assert a == b and len(a) > 0


def test_sample_membership_stable_under_growth(spark):
    """Rows selected from a subset stay selected in the full set
    (incremental pipelines never churn prior selections)."""
    docs = load_table(spark, SF_DIR, "documents")
    subset = docs.where(F.col("doc_id") % 2 == 0)
    from_subset = {r.doc_id for r in
                   cu.deterministic_sample(subset, ["doc_id"], 20)
                   .select("doc_id").collect()}
    from_full = {r.doc_id for r in
                 cu.deterministic_sample(docs, ["doc_id"], 20)
                 .select("doc_id").collect()}
    assert from_subset == {d for d in from_full if d % 2 == 0}


def test_cap_per_group_bound_and_determinism(spark):
    docs = load_table(spark, SF_DIR, "documents")
    capped = cu.cap_per_group(
        docs, ["lang"], [F.desc("n_chars"), F.asc("doc_id")], 3
    )
    per_group = capped.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    assert per_group.where(F.col("n") > 3).count() == 0
    # deterministic across runs
    r1 = sorted((r.lang, r.doc_id) for r in capped.select("lang", "doc_id").collect())
    r2 = sorted((r.lang, r.doc_id) for r in capped.select("lang", "doc_id").collect())
    assert r1 == r2


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma zeta eta"),      # shares 'alpha beta gamma'
            (3, "one two three four five"),         # clean
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta suffix")],
        "doc_id long, text string",
    )
    hits = {
        r["id"]: r["n_hits"]
        for r in cu.decontaminate(train, eval_set, "doc_id", "text", ngram=3).collect()
    }
    # doc 1 shares 'alpha beta gamma' and 'beta gamma delta'; doc 2 one.
    assert hits == {1: 2, 2: 1}


def test_pack_sequences_chunk_layout(spark):
    # 4 docs of 60 tokens in one group, budget 100: offsets 0/60/120/180
    # -> chunks 0,0,1,1 (doc may straddle; assigned where it starts).
    df = spark.createDataFrame(
        [(i, "g", 60) for i in range(4)], "doc_id long, grp string, toks int"
    )
    out = cu.pack_sequences(
        df, "toks", 100, ["grp"], [F.asc("doc_id")]
    ).orderBy("doc_id")
    rows = [(r["start_offset"], r["chunk_id"]) for r in out.collect()]
    assert rows == [(0, 0), (60, 0), (120, 1), (180, 1)]


def test_quantile_threshold_filter_keeps_top_quartile(spark):
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(1, 101)],
        "doc_id long, grp string, score double",
    )
    kept = cu.quantile_threshold_filter(df, "score", ["grp"], q=0.75)
    scores = sorted(r["score"] for r in kept.collect())
    # exact interpolated P75 of 1..100 is 75.25 -> keep 76..100
    assert scores == [float(s) for s in range(76, 101)]
    assert kept.select("threshold").distinct().collect()[0][0] == 75.25
