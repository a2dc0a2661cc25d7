"""Persistent IVF index (pipelines/ivf_index.py): search equivalence
with the batch operator, incremental adds without retrain, and
cell-bucket pruning."""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.operators.similarity import ivf_topk
from nextbus2pg_spark.pipelines.ivf_index import IvfIndex

SF_DIR = "/root/testdata/sf0.001"


def _file_hashes(path):
    out = {}
    for p in glob.glob(f"{path}/**/*.parquet", recursive=True):
        with open(p, "rb") as f:
            out[os.path.relpath(p, path)] = hashlib.md5(f.read()).hexdigest()
    return out


def test_search_matches_batch_operator(spark, tmp_path):
    """Trained on the same corpus with the same parameters, index
    search must reproduce ivf_topk EXACTLY (both are deterministic)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.filter("vec_id >= 10")
    queries = emb.filter("vec_id < 5")
    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), n_centroids=8, kmeans_iters=2
    )
    idx.train(corpus)
    got = sorted(
        tuple(r) for r in idx.search(queries, k=5, nprobe=3).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivf_topk(
            corpus, queries, "vec_id", "embedding",
            k=5, n_centroids=8, nprobe=3, kmeans_iters=2,
        ).collect()
    )
    assert got == want and got


def test_add_is_incremental_and_search_prunes(spark, tmp_path):
    """add() must not rewrite existing index files or retrain; search
    must pass a pruned bucket list and still surface matches from the
    post-train batch."""
    emb = load_table(spark, SF_DIR, "embeddings")
    part_a = emb.filter("vec_id >= 10 and vec_id < 60")
    part_b = emb.filter("vec_id >= 60 and vec_id < 90")
    # queries are EXACT COPIES of three part_b vectors under fresh ids:
    # their twins must come back at sim 1.0 — provable evidence that
    # the post-train batch was assigned and is searchable
    queries = emb.filter("vec_id >= 60 and vec_id < 63").select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )

    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), n_centroids=8, kmeans_iters=1,
        n_buckets=8,
    )
    idx.train(part_a)
    cents_before = sorted(
        tuple(r) for r in idx.centroids.read().select("centroid_id").collect()
    )
    before = _file_hashes(str(tmp_path / "ivf"))
    idx.add(part_b)
    after = _file_hashes(str(tmp_path / "ivf"))
    for p, h in before.items():
        assert after.get(p) == h, f"add rewrote {p}"
    assert cents_before == sorted(
        tuple(r) for r in idx.centroids.read().select("centroid_id").collect()
    ), "add must not retrain centroids"

    reads: list = []
    orig = idx.vectors.read

    def spy(buckets=None):
        reads.append(buckets)
        return orig(buckets)

    idx.vectors.read = spy
    res = idx.search(queries, k=3, nprobe=2).collect()
    assert reads and reads[0] is not None and 0 < len(reads[0]) < 8, (
        "search must pass a STRICTLY pruned bucket list"
    )
    # Pruned-IO ratio at FILE granularity, single-query shape (3
    # queries x nprobe=2 legitimately touch most of 8 toy buckets):
    # one query probes 2 cells -> at most 2 store buckets' dirs are
    # ever listed/opened.
    reads.clear()
    idx.search(queries.limit(1), k=3, nprobe=2).collect()
    pruned_dirs = len(idx.vectors._bucket_dirs(reads[0]))
    total_dirs = len(idx.vectors._bucket_dirs(None))
    assert 0 < pruned_dirs <= total_dirs * 0.5, (
        f"search read {pruned_dirs}/{total_dirs} vector dirs — pruning "
        "ratio regressed"
    )
    # each query's identical twin lives in part_b → rank 1 at sim 1.0
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid in (1060, 1061, 1062):
        top = min(by_q[qid], key=lambda r: r["rank"])
        assert top["match_id"] == qid - 1000 and top["sim"] == 1.0, top

    with pytest.raises(ValueError):
        idx.train(part_a)  # retrain must be an explicit new path


def test_recall_floor_after_incremental_adds(spark, tmp_path):
    """Recall@5 vs exact cosine stays above the ivf floor even when
    half the corpus arrived AFTER training (centroid drift case)."""
    from nextbus2pg_spark.operators.similarity import (
        cosine_topk_vectorized,
        recall_at_k,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.filter("vec_id >= 10")
    half_a = corpus.filter("vec_id % 2 = 0")
    half_b = corpus.filter("vec_id % 2 = 1")
    queries = emb.filter("vec_id < 5")
    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), n_centroids=8, kmeans_iters=2
    )
    idx.train(half_a)
    idx.add(half_b)
    approx = idx.search(queries, k=5, nprobe=4)
    exact = cosine_topk_vectorized(corpus, queries, "vec_id", "embedding", k=5)
    assert recall_at_k(exact, approx) >= 0.6


def test_add_if_absent_is_replay_safe(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    idx = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=4, kmeans_iters=0)
    idx.train(emb.filter("vec_id < 40"))
    batch = emb.filter("vec_id >= 40 and vec_id < 50")
    idx.add_if_absent(batch)
    idx.add_if_absent(batch)  # replay
    dup = (
        idx.vectors.read().groupBy("id").count().filter("count > 1").count()
    )
    assert dup == 0, "replayed batch duplicated index rows"
    assert idx.vectors.read().filter("id >= 40 and id < 50").count() == 10


def test_streaming_embedding_index(spark, tmp_path):
    """File-streamed embeddings reach the index across two availableNow
    runs (restart included); a twin query finds the streamed vector."""
    import json
    import os

    from nextbus2pg_spark.streaming.curation import start_embedding_index

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=4, kmeans_iters=0)
    idx.train(emb.filter("vec_id < 30"))

    rows = emb.filter("vec_id >= 30 and vec_id < 34").collect()
    spool = str(tmp_path / "spool")
    os.makedirs(spool)

    def write_batch(name, rs):
        with open(os.path.join(spool, name), "w") as f:
            for r in rs:
                f.write(json.dumps(
                    {"vec_id": r["vec_id"],
                     "embedding": [float(x) for x in r["embedding"]]}
                ) + "\n")

    stream_schema = "vec_id long, embedding array<float>"
    write_batch("b1.json", rows[:2])
    q = start_embedding_index(
        spark.readStream.schema(stream_schema).json(spool),
        idx, str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    write_batch("b2.json", rows[2:])
    q = start_embedding_index(
        spark.readStream.schema(stream_schema).json(spool),
        idx, str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    assert idx.vectors.read().filter("id >= 30 and id < 34").count() == 4
    twin = spark.createDataFrame(
        [(9000, rows[3]["embedding"])], stream_schema
    )
    res = idx.search(twin, k=1, nprobe=2).collect()
    assert res and res[0]["match_id"] == rows[3]["vec_id"]
    assert res[0]["sim"] == 1.0


def test_add_if_absent_dedups_within_batch(spark, tmp_path):
    """A producer retry landing the same record twice in ONE batch must
    not duplicate index rows (regression: the store anti-join alone
    cannot see within-batch duplicates)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    idx = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=4, kmeans_iters=0)
    idx.train(emb.filter("vec_id < 40"))
    one = emb.filter("vec_id = 40")
    idx.add_if_absent(one.unionAll(one))
    assert idx.vectors.read().filter("id = 40").count() == 1
    # a FULLY replayed batch publishes no new generation at all
    gens_before = idx.vectors.generations()
    idx.add_if_absent(one)
    assert idx.vectors.generations() == gens_before


def test_delete_removes_vector_from_search_without_rebuild(spark, tmp_path):
    """A deleted embedding stops appearing as an ANN neighbor — no
    rebuild: delete() re-derives the cell assignment from the preimage
    vector, so only the assigned cells' buckets rewrite and untouched
    buckets keep their dir lists byte-identical."""
    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.filter("vec_id >= 10 and vec_id < 80")
    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), n_centroids=8, kmeans_iters=1
    )
    idx.train(corpus)

    # query with an exact copy of vec 42: the twin comes back at sim 1.0
    twin = corpus.filter("vec_id = 42").select(
        F.lit(9001).alias("vec_id"), "embedding"
    )
    hits = idx.search(twin, k=5, nprobe=3).collect()
    assert 42 in {r["match_id"] for r in hits}
    before = dict(idx.vectors.current_manifest()["buckets"])

    idx.delete(corpus.filter("vec_id = 42"))

    assert 42 not in {
        r["match_id"] for r in idx.search(twin, k=5, nprobe=3).collect()
    }
    assert idx.vectors.read().filter("id = 42").count() == 0
    # bucket pruning: at least one vector bucket untouched
    after = dict(idx.vectors.current_manifest()["buckets"])
    untouched = [b for b in before if b in after and before[b] == after[b]]
    assert untouched, (before, after)
    # idempotent: re-deleting is a no-op for the manifest
    gen = idx.vectors.current_manifest()["gen"]
    idx.delete(corpus.filter("vec_id = 42"))
    assert idx.vectors.current_manifest()["gen"] == gen


def test_apply_changes_follows_embedding_store(spark, tmp_path):
    """CDC loop for the vector index: store deletes drop index rows,
    an upsert that CHANGES an embedding moves it (possibly across
    cells), and a replayed delta converges."""
    from nextbus2pg_spark.pipelines.change_feed import ChangeFeedFollower
    from nextbus2pg_spark.sinks.upsert import ParquetUpsertTable

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus_df = emb.filter("vec_id >= 10 and vec_id < 80")
    store = ParquetUpsertTable(
        spark, str(tmp_path / "emb"), key_cols=["vec_id"],
        update_cols=["embedding"], n_buckets=4,
    )
    store.store.keep_generations = 10
    store.upsert(corpus_df)

    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), n_centroids=8, kmeans_iters=1
    )
    follower = ChangeFeedFollower(store.store, str(tmp_path / "marker"))

    def bootstrap(df):
        idx.train(df)

    follower.resync(bootstrap)

    twin42 = corpus_df.filter("vec_id = 42").select(
        F.lit(9001).alias("vec_id"), "embedding"
    ).localCheckpoint()
    assert 42 in {
        r["match_id"] for r in idx.search(twin42, k=5, nprobe=3).collect()
    }

    # delete 42; move 50 onto 60's embedding (payload change)
    store.delete(spark.createDataFrame([(42,)], "vec_id long"))
    assert follower.poll(lambda df: idx.apply_changes(df)) is not None
    assert 42 not in {
        r["match_id"] for r in idx.search(twin42, k=5, nprobe=3).collect()
    }

    moved = corpus_df.filter("vec_id = 60").select(
        F.lit(50).alias("vec_id"), "embedding"
    )
    store.upsert(moved)
    marker_before = follower.last_applied()
    assert follower.poll(lambda df: idx.apply_changes(df)) is not None
    twin60 = corpus_df.filter("vec_id = 60").select(
        F.lit(9002).alias("vec_id"), "embedding"
    ).localCheckpoint()
    hits60 = {
        r["match_id"]: r["sim"]
        for r in idx.search(twin60, k=5, nprobe=3).collect()
    }
    assert hits60.get(50) == 1.0 and hits60.get(60) == 1.0, hits60

    # replay the delta: index must converge, exactly one row per id
    follower._advance(marker_before)
    follower.poll(lambda df: idx.apply_changes(df))
    hits60 = {
        r["match_id"]: r["sim"]
        for r in idx.search(twin60, k=5, nprobe=3).collect()
    }
    assert hits60.get(50) == 1.0 and hits60.get(60) == 1.0, hits60
    per_id = idx.vectors.read().groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in per_id), [
        r for r in per_id if r["count"] != 1
    ]


def test_retrain_swap_is_atomic_for_inflight_readers(spark, tmp_path):
    """retrain_swap (round-6 verdict task #6): a reader that resolved
    its view BEFORE the swap keeps a fully consistent pre-swap index
    (bit-identical results, via the pinned epoch the reader captured);
    a reader arriving AFTER sees the complete new epoch. No
    interleaving exposes mixed centroids/assignments."""
    emb = load_table(spark, SF_DIR, "embeddings")
    corpus_a = emb.filter("vec_id >= 10 and vec_id < 60")
    corpus_b = emb.filter("vec_id >= 10 and vec_id < 90")  # grown
    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), n_centroids=8, kmeans_iters=1
    )
    idx.train(corpus_a)
    assert idx.current_epoch() == 0

    twin42 = corpus_a.filter("vec_id = 42").select(
        F.lit(9001).alias("vec_id"), "embedding"
    ).localCheckpoint()
    twin85 = emb.filter("vec_id = 85").select(
        F.lit(9002).alias("vec_id"), "embedding"
    ).localCheckpoint()
    r_old = sorted(
        tuple(r) for r in idx.search(twin42, k=5, nprobe=3).collect()
    )
    # 85 is not in corpus A: pre-swap search can't find it
    assert 85 not in {
        r["match_id"] for r in idx.search(twin85, k=5, nprobe=8).collect()
    }

    # an in-flight reader resolves its epoch, THEN the swap completes
    reader_epoch = idx.current_epoch()
    assert idx.retrain_swap(corpus_b) == 1
    assert idx.current_epoch() == 1

    # the stale reader's pinned view is byte-identical to pre-swap
    r_stale = sorted(
        tuple(r)
        for r in idx.search(twin42, k=5, nprobe=3,
                            epoch=reader_epoch).collect()
    )
    assert r_stale == r_old
    assert 85 not in {
        r["match_id"]
        for r in idx.search(twin85, k=5, nprobe=8,
                            epoch=reader_epoch).collect()
    }

    # a fresh reader sees the complete retrained corpus
    assert 85 in {
        r["match_id"] for r in idx.search(twin85, k=5, nprobe=8).collect()
    }
    assert 42 in {
        r["match_id"] for r in idx.search(twin42, k=5, nprobe=3).collect()
    }

    # prune drops the old epoch without changing the current view
    r_new = sorted(
        tuple(r) for r in idx.search(twin85, k=5, nprobe=8).collect()
    )
    assert idx.prune_stale_epochs() == 1
    assert sorted(
        tuple(r) for r in idx.search(twin85, k=5, nprobe=8).collect()
    ) == r_new
    epochs = {r["epoch"] for r in idx.vectors.read().select(
        "epoch").distinct().collect()}
    assert epochs == {1}
    per_id = idx.vectors.read().groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in per_id)


def test_retrain_swap_crash_before_flip_is_invisible_and_retryable(
    spark, tmp_path
):
    """A crash BETWEEN the new epoch's vector append and the centroid
    flip leaves readers on the old epoch (debris invisible); a retried
    swap skips past the debris epoch and converges; prune sweeps the
    debris."""
    emb = load_table(spark, SF_DIR, "embeddings")
    corpus_a = emb.filter("vec_id >= 10 and vec_id < 60")
    corpus_b = emb.filter("vec_id >= 10 and vec_id < 90")
    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), n_centroids=8, kmeans_iters=1
    )
    idx.train(corpus_a)
    twin42 = corpus_a.filter("vec_id = 42").select(
        F.lit(9001).alias("vec_id"), "embedding"
    ).localCheckpoint()
    r_old = sorted(
        tuple(r) for r in idx.search(twin42, k=5, nprobe=3).collect()
    )

    # crash: the centroid append (the flip) never happens
    real_append = idx.centroids.append
    idx.centroids.append = lambda df, **kw: (_ for _ in ()).throw(
        RuntimeError("crash before flip")
    )
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        idx.retrain_swap(corpus_b)
    idx.centroids.append = real_append

    # readers are untouched: still epoch 0, identical results
    assert idx.current_epoch() == 0
    assert sorted(
        tuple(r) for r in idx.search(twin42, k=5, nprobe=3).collect()
    ) == r_old

    # retry publishes a COMPLETE higher epoch (debris epoch skipped)
    new_epoch = idx.retrain_swap(corpus_b)
    assert new_epoch == 2  # 1 is the crash-debris epoch
    assert idx.current_epoch() == 2
    twin85 = emb.filter("vec_id = 85").select(
        F.lit(9002).alias("vec_id"), "embedding"
    ).localCheckpoint()
    assert 85 in {
        r["match_id"] for r in idx.search(twin85, k=5, nprobe=8).collect()
    }

    # prune sweeps the superseded epoch AND the debris above/below
    idx.prune_stale_epochs()
    epochs = {r["epoch"] for r in idx.vectors.read().select(
        "epoch").distinct().collect()}
    assert epochs == {2}
    per_id = idx.vectors.read().groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in per_id)


def test_adds_and_deletes_land_in_current_epoch_after_swap(
    spark, tmp_path
):
    """Post-swap maintenance writes target the new epoch: add_if_absent
    indexes against the NEW centroids, delete removes only the current
    epoch's row (pinned old-epoch reads stay replayable until prune)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    corpus_a = emb.filter("vec_id >= 10 and vec_id < 60")
    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), n_centroids=8, kmeans_iters=1
    )
    idx.train(corpus_a)
    idx.retrain_swap(corpus_a)

    batch = emb.filter("vec_id >= 60 and vec_id < 70")
    idx.add_if_absent(batch)
    rows = idx.vectors.read().where("id >= 60 and id < 70").collect()
    assert len(rows) == 10 and all(r["epoch"] == 1 for r in rows)

    twin42 = corpus_a.filter("vec_id = 42").select(
        F.lit(9001).alias("vec_id"), "embedding"
    ).localCheckpoint()
    idx.delete(corpus_a.filter("vec_id = 42"))
    assert 42 not in {
        r["match_id"] for r in idx.search(twin42, k=5, nprobe=3).collect()
    }
    # the frozen epoch-0 snapshot still holds the deleted doc
    assert 42 in {
        r["match_id"]
        for r in idx.search(twin42, k=5, nprobe=3, epoch=0).collect()
    }


def test_prune_stale_epochs_occ_guards_concurrent_adds(spark, tmp_path):
    """A concurrent add landing between prune's read and its publish
    must fail the prune loudly (OCC expected_gen), never be silently
    erased; the retry then converges with the add's rows intact."""
    from nextbus2pg_spark.sinks.store import ConcurrentWriteError

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), n_centroids=8, kmeans_iters=1
    )
    idx.train(emb.filter("vec_id >= 10 and vec_id < 60"))
    idx.retrain_swap(emb.filter("vec_id >= 10 and vec_id < 60"))

    batch = emb.filter("vec_id >= 90 and vec_id < 95")
    orig = idx.vectors.replace_buckets

    def racing(merged, touched, expected_gen=None, **kw):
        idx.vectors.replace_buckets = orig  # race once
        idx.add(batch)  # concurrent writer publishes first
        return orig(merged, touched, expected_gen=expected_gen, **kw)

    idx.vectors.replace_buckets = racing
    with pytest.raises(ConcurrentWriteError):
        idx.prune_stale_epochs()

    idx.prune_stale_epochs()  # retry on the new generation
    rows = idx.vectors.read().collect()
    assert {r["epoch"] for r in rows} == {1}
    ids = {r["id"] for r in rows}
    assert {90, 91, 92, 93, 94} <= ids  # the racer's rows survived
    per_id = {}
    for r in rows:
        per_id[r["id"]] = per_id.get(r["id"], 0) + 1
    assert all(c == 1 for c in per_id.values())


def test_retrain_swap_after_all_vectors_deleted(spark, tmp_path):
    """ADVICE r7: an emptied vectors store (every id delete()d) left
    max(epoch) = NULL and retrain_swap crashed on int(None); the epoch
    must fall back to the centroid store's and the swap must publish a
    complete fresh epoch."""
    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.filter("vec_id < 30")
    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), n_centroids=4, kmeans_iters=1
    )
    idx.train(corpus)
    idx.delete(corpus)  # empty the vectors store entirely
    assert idx.vectors.read().count() == 0

    epoch = idx.retrain_swap(corpus)
    assert epoch == idx.current_epoch() and epoch >= 1
    assert idx.vectors.read().filter(F.col("epoch") == epoch).count() == 30
    twin = corpus.filter("vec_id = 7").select(
        F.lit(9001).alias("vec_id"), "embedding"
    )
    assert 7 in {
        r["match_id"] for r in idx.search(twin, k=3, nprobe=4).collect()
    }
