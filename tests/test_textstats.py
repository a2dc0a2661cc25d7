"""Corpus-statistics operators (operators/textstats.py)."""

from __future__ import annotations


def test_oov_ngram_ratio_model_and_scoring(spark):
    """Top-k bigram model + OOV scoring: a doc made of the dominant
    bigram scores 0.0; a doc of never-repeated bigrams scores 1.0 when
    the model is saturated by the dominant ones; short docs (< n words)
    are absent."""
    from nextbus2pg_spark.operators.textstats import oov_ngram_ratio

    rows = (
        [(i, "a b a b a b") for i in range(5)]        # 'a b'/'b a' dominate
        + [(100, "x y z w")]                          # all rare bigrams
        + [(200, "solo")]                             # no bigrams
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in oov_ngram_ratio(
        df, "doc_id", "text", n=2, top_k=2
    ).collect()}
    assert 200 not in out
    assert out[0]["oov_ratio"] == 0.0 and out[0]["n_grams"] == 5
    assert out[100]["n_oov"] == 3 and out[100]["oov_ratio"] == 1.0


def test_bm25_duplicate_query_terms_score_once(spark):
    """A repeated query term must not double its contribution: BM25
    scores a term SET, so ['rare', 'rare'] ranks and scores exactly
    like ['rare'] (ADVICE round-5: duplicates silently skewed
    rankings relative to standard BM25)."""
    from nextbus2pg_spark.operators.textstats import bm25_topk

    df = spark.createDataFrame(
        [(1, "rare word here"), (2, "other words entirely"),
         (3, "rare rare filler")],
        "doc_id long, text string",
    )
    once = bm25_topk(df, "doc_id", "text", ["rare"], k=3).collect()
    twice = bm25_topk(df, "doc_id", "text", ["rare", "rare"], k=3).collect()
    assert [r.asDict() for r in once] == [r.asDict() for r in twice]
    assert {r["id"] for r in once} == {1, 3}
