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


def test_bigram_logprob_hand_computed(spark):
    """Laplace bigram LM on a 2-doc corpus, every value hand-derived:
    c(a,b)=2, c(b,a)=1, ctx(a)=2, ctx(b)=1, V=2."""
    import math

    from nextbus2pg_spark.operators.textstats import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in bigram_logprob(df, "doc_id", "text").collect()}
    assert 3 not in out  # <2 words: no bigrams, no row
    lp_ab = math.log(3 / 4)   # (2+1)/(2+2)
    lp_ba = math.log(2 / 3)   # (1+1)/(1+2)
    assert out[1]["n_bigrams"] == 2
    assert out[1]["sum_logprob"] == round(lp_ab + lp_ba, 6)
    assert out[1]["avg_logprob"] == round((lp_ab + lp_ba) / 2, 6)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["sum_logprob"] == round(lp_ab, 6)
    # repetitive garbage scores below fluent text from the same model
    df2 = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)]
        + [(100, "zz qq zz qq zz")],
        "doc_id long, text string",
    )
    scores = {
        r["id"]: r["avg_logprob"]
        for r in bigram_logprob(df2, "doc_id", "text").collect()
    }
    assert scores[100] < scores[0]
