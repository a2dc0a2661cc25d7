"""CDC → index loop composed end-to-end (round-6 verdict task #4):
ONE corpus store (text + embedding per doc) feeds BOTH incremental
indexes (NearDupIndex, IvfIndex) through real ChangeFeedFollower
markers. The distinguishing scenario vs the per-index unit tests: a
crash genuinely MID-APPLY — the delete half of an upsert delta lands,
the insert half does not, the marker never advances — after which a
plain replayed poll must converge both indexes to the exact state a
crash-free run would have produced."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.pipelines.change_feed import ChangeFeedFollower
from nextbus2pg_spark.pipelines.ivf_index import IvfIndex
from nextbus2pg_spark.pipelines.neardup_index import NearDupIndex
from nextbus2pg_spark.sinks.upsert import ParquetUpsertTable

SF_DIR = "/root/testdata/sf0.001"

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while the sun sets slowly behind distant purple mountains tonight"
)

REWRITE = (
    "entirely rewritten content about sailing boats across cold "
    "northern seas under bright star filled winter skies and waves"
)


def _corpus_rows(spark, lo, hi):
    """(doc_id, text, embedding) rows: testdata embeddings + variant
    text, so one store feeds both the lexical and the vector index."""
    emb = load_table(spark, SF_DIR, "embeddings")
    return emb.filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    ).select(
        F.col("vec_id").alias("doc_id"),
        F.concat(F.lit(BASE + " variant "), F.col("vec_id")).alias("text"),
        "embedding",
    )


def _text_probe(spark, probe_id, text):
    return spark.createDataFrame(
        [(probe_id, text)], "doc_id long, text string"
    )


def _vec_twin(spark, corpus_df, src_id, twin_id):
    return (
        corpus_df.filter(F.col("doc_id") == src_id)
        .select(F.lit(twin_id).alias("doc_id"), "embedding")
        .localCheckpoint()
    )


def test_cdc_loop_both_indexes_crash_mid_apply(spark, tmp_path):
    corpus = ParquetUpsertTable(
        spark, str(tmp_path / "corpus"), key_cols=["doc_id"],
        update_cols=["text", "embedding"], n_buckets=4,
    )
    corpus.store.keep_generations = 20

    ndi = NearDupIndex(spark, str(tmp_path / "ndi"), n_buckets=8)
    ivf = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=8,
                   kmeans_iters=1)
    f_nd = ChangeFeedFollower(corpus.store, str(tmp_path / "marker_nd"))
    f_ivf = ChangeFeedFollower(corpus.store, str(tmp_path / "marker_ivf"))

    # bootstrap: one store publish, two followers resync independently
    seed = _corpus_rows(spark, 0, 64).localCheckpoint()
    corpus.upsert(seed)
    f_nd.resync(
        lambda df: ndi.add_if_absent(df, id_col="doc_id", text_col="text")
    )
    f_ivf.resync(
        lambda df: ivf.train(df, id_col="doc_id", vec_col="embedding")
    )

    probe3 = _text_probe(spark, 990, BASE + " variant 3")
    twin42 = _vec_twin(spark, seed, 42, 991)
    assert {r["indexed_id"] for r in ndi.probe(probe3).collect()} >= {3}
    assert 42 in {
        r["match_id"]
        for r in ivf.search(
            twin42, id_col="doc_id", vec_col="embedding", k=5, nprobe=3
        ).collect()
    }

    # corpus delete → one poll per follower → gone from BOTH indexes
    corpus.delete(spark.createDataFrame([(3,), (42,)], "doc_id long"))
    assert f_nd.poll(
        lambda df: ndi.apply_changes(df, id_col="doc_id", text_col="text")
    ) is not None
    assert f_ivf.poll(
        lambda df: ivf.apply_changes(df, id_col="doc_id",
                                     vec_col="embedding")
    ) is not None
    assert 3 not in {r["indexed_id"] for r in ndi.probe(probe3).collect()}
    assert 42 not in {
        r["match_id"]
        for r in ivf.search(
            twin42, id_col="doc_id", vec_col="embedding", k=5, nprobe=3
        ).collect()
    }

    # upsert moving doc 5 onto a new payload (text rewrite + the
    # embedding of doc 60) and inserting a brand-new doc 100
    new_batch = (
        seed.filter(F.col("doc_id") == 60)
        .select(
            F.lit(5).alias("doc_id"), F.lit(REWRITE).alias("text"),
            "embedding",
        )
        .unionByName(_corpus_rows(spark, 100, 101))
    )
    corpus.upsert(new_batch)

    # CRASH MID-APPLY on both followers: the delete half of the delta
    # lands, then the process dies before the insert half — poll raises,
    # so the marker must NOT advance
    def crash_nd(changes):
        changes = changes.localCheckpoint()
        ndi.delete(
            changes.where(F.col("_change_type") == "delete"),
            id_col="doc_id",
        )
        raise RuntimeError("crash between delete and insert half")

    def crash_ivf(changes):
        changes = changes.localCheckpoint()
        ivf.delete(
            changes.where(F.col("_change_type") == "delete"),
            id_col="doc_id", vec_col="embedding",
        )
        raise RuntimeError("crash between delete and insert half")

    nd_marker, ivf_marker = f_nd.last_applied(), f_ivf.last_applied()
    with pytest.raises(RuntimeError):
        f_nd.poll(crash_nd)
    with pytest.raises(RuntimeError):
        f_ivf.poll(crash_ivf)
    assert f_nd.last_applied() == nd_marker
    assert f_ivf.last_applied() == ivf_marker

    # the partial state is real: doc 5's OLD image is already gone from
    # the text index, and its NEW image is not searchable yet
    probe_old5 = _text_probe(spark, 992, BASE + " variant 5")
    probe_new5 = _text_probe(spark, 993, REWRITE + " extra")
    assert 5 not in {
        r["indexed_id"] for r in ndi.probe(probe_old5).collect()
    }
    assert 5 not in {
        r["indexed_id"] for r in ndi.probe(probe_new5).collect()
    }

    # restart: plain replayed polls with the REAL apply converge
    assert f_nd.poll(
        lambda df: ndi.apply_changes(df, id_col="doc_id", text_col="text")
    ) is not None
    assert f_ivf.poll(
        lambda df: ivf.apply_changes(df, id_col="doc_id",
                                     vec_col="embedding")
    ) is not None

    assert {r["indexed_id"] for r in ndi.probe(probe_new5).collect()} == {5}
    probe100 = _text_probe(spark, 994, BASE + " variant 100")
    assert 100 in {
        r["indexed_id"] for r in ndi.probe(probe100).collect()
    }
    twin60 = _vec_twin(spark, seed, 60, 995)
    hits60 = {
        r["match_id"]: r["sim"]
        for r in ivf.search(
            twin60, id_col="doc_id", vec_col="embedding", k=5, nprobe=3
        ).collect()
    }
    assert hits60.get(5) == 1.0 and hits60.get(60) == 1.0, hits60

    # converged means exactly one index row per live id in both stores
    sig_rows = ndi.sigs.read().groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in sig_rows), sig_rows
    vec_rows = ivf.vectors.read().groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in vec_rows), vec_rows
    live = {r["id"] for r in ivf.vectors.read().select("id").collect()}
    assert 42 not in live and {5, 60, 100} <= live

    # and the loop keeps running: one more routine delta, both catch up
    corpus.delete(spark.createDataFrame([(100,)], "doc_id long"))
    assert f_nd.poll(
        lambda df: ndi.apply_changes(df, id_col="doc_id", text_col="text")
    ) is not None
    assert f_ivf.poll(
        lambda df: ivf.apply_changes(df, id_col="doc_id",
                                     vec_col="embedding")
    ) is not None
    assert 100 not in {
        r["indexed_id"] for r in ndi.probe(probe100).collect()
    }
    assert 100 not in {
        r["id"] for r in ivf.vectors.read().select("id").collect()
    }
