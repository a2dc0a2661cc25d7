"""ANN recall harness (VERDICT r01 Missing #3): recall@k of the
approximate indexes against the exact ``cosine_topk`` baseline, pinned
at the settings the fixture queries ship with. Everything here is
deterministic (md5-derived hyperplanes, first-N + Lloyd centroids,
fixed fixture data), so these are exact floors, not flaky statistics.

Measured at sf0.01 (500 vectors × 64 dims, 10 queries, k=5):

| index | setting              | recall@5 |
|-------|----------------------|----------|
| LSH   | n_bits=4, 1 table    | 0.58     |
| LSH   | n_bits=4, 2 tables   | 0.82     |
| LSH   | n_bits=4, 4 tables   | 0.98     |
| IVF   | 16 cent, nprobe=4    | 0.46     |
| IVF   | +3 Lloyd, nprobe=8   | 0.84     |
| PQ    | m=32, 32 codes       | 0.80     |

The fixture embeddings are near-uniform (synthetic), so IVF recall
tracks the searched fraction (nprobe/n_centroids); on clustered
real-world embeddings the same settings recall higher.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    kmeans_centroids,
    lsh_topk,
    pq_encode,
    pq_topk,
    pq_train,
    recall_at_k,
)
from tests.conftest import SF_DIR

K = 5


@pytest.fixture(scope="module")
def ann_frames(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=K)
    exact = exact.localCheckpoint(eager=True)  # reused by every floor
    return emb, queries, exact


def test_lsh_topk_recall_floor(spark, ann_frames):
    """The shipped q_lsh_topk settings (n_bits=4, 4 tables) must keep
    recall@5 >= 0.8 — a user tuning n_bits/n_tables reads this number
    instead of flying blind."""
    emb, queries, exact = ann_frames
    approx = lsh_topk(
        emb, queries, "vec_id", "embedding", k=K, n_bits=4, n_tables=4
    )
    assert recall_at_k(exact, approx) >= 0.8


def test_lsh_multi_table_recall_compounds(spark, ann_frames):
    """More independent tables strictly help: 4 tables >= 1 table."""
    emb, queries, exact = ann_frames
    one = recall_at_k(
        exact,
        lsh_topk(emb, queries, "vec_id", "embedding", k=K, n_bits=4),
    )
    four = recall_at_k(
        exact,
        lsh_topk(
            emb, queries, "vec_id", "embedding", k=K, n_bits=4, n_tables=4
        ),
    )
    assert four >= one
    assert four >= 0.8 > one  # the single-table floor is the motivation


def test_ivf_topk_recall_floor(spark, ann_frames):
    """The shipped q_ivf_topk settings (16 centroids, 3 Lloyd
    iterations, nprobe=8) must keep recall@5 >= 0.8."""
    emb, queries, exact = ann_frames
    approx = ivf_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        k=K,
        n_centroids=16,
        nprobe=8,
        kmeans_iters=3,
    )
    assert recall_at_k(exact, approx) >= 0.8


def test_ivf_full_probe_is_exact(spark, ann_frames):
    """nprobe == n_centroids degenerates to the exact result — the
    correctness anchor for the IVF join shape."""
    emb, queries, exact = ann_frames
    full = ivf_topk(
        emb, queries, "vec_id", "embedding", k=K, n_centroids=8, nprobe=8
    )
    assert recall_at_k(exact, full) == 1.0


def test_pq_topk_recall_floor(spark, ann_frames):
    """The shipped q_pq_topk settings (m=32 subvectors, 32 codes,
    2 Lloyd iterations) must keep recall@5 >= 0.7 while scanning ONLY
    the 32-int code per candidate (no corpus vectors at query time) —
    measured 0.80 on the near-uniform fixture embeddings, a worst case
    for quantization; clustered real embeddings recall higher."""
    emb, queries, exact = ann_frames
    book = pq_train(emb, "vec_id", "embedding", m=32, n_codes=32, n_iters=2)
    codes = pq_encode(emb, book, "vec_id", "embedding")
    approx = pq_topk(codes, book, queries, "vec_id", "embedding", k=K)
    assert recall_at_k(exact, approx) >= 0.7


def test_pq_encode_deterministic(spark, ann_frames):
    """Training + encoding are RNG-free: two independent runs produce
    byte-identical codebooks and codes (retry/rerun stability)."""
    emb, _, _ = ann_frames
    small = emb.where(F.col("vec_id") < 100)
    a_book = pq_train(small, "vec_id", "embedding", m=8, n_codes=8, n_iters=1)
    b_book = pq_train(small, "vec_id", "embedding", m=8, n_codes=8, n_iters=1)
    assert sorted(map(tuple, a_book.collect())) == sorted(
        map(tuple, b_book.collect())
    )
    a = pq_encode(small, a_book, "vec_id", "embedding")
    b = pq_encode(small, b_book, "vec_id", "embedding")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ivfpq_topk_recall_floor(spark, ann_frames):
    """The composed 100 TB shape (coarse IVF pruning x PQ code-only
    scoring) compounds both error sources; measured 0.72 at the
    shipped settings, pinned >= 0.6. Bucket-pruned candidates ADC-score
    without reading any corpus vector at query time."""
    from nextbus2pg_spark.operators.similarity import ivfpq_topk

    emb, queries, exact = ann_frames
    approx = ivfpq_topk(emb, queries, "vec_id", "embedding", k=K)
    assert recall_at_k(exact, approx) >= 0.6


def test_quantized_cosine_stays_faithful(spark, ann_frames):
    """int8 storage quantization must not meaningfully perturb
    similarity search: exact cosine over DEQUANTIZED vectors matches
    the float baseline's top-5 at recall >= 0.9 (per-component error
    is <= scale/2 = max|x|/254)."""
    from nextbus2pg_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    emb, queries, exact = ann_frames
    deq = dequantize_embeddings(
        quantize_embeddings(emb, "vec_id", "embedding")
    ).select(F.col("id").alias("vec_id"), F.col("vec").alias("embedding"))
    q_deq = deq.join(
        queries.select("vec_id"), "vec_id", "left_semi"
    )
    approx = cosine_topk(deq, q_deq, "vec_id", "embedding", k=K)
    assert recall_at_k(exact, approx) >= 0.9


def test_unit_normalization_guards_zero_vectors(spark):
    """An all-zero embedding must stay all-zero after unit
    normalization (norm floored at epsilon), not become NaN subvectors
    that poison pq_train centroids and ADC score ordering (mirrors the
    quantize_embeddings scale==0 guard)."""
    from nextbus2pg_spark.operators.similarity import _unit

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0, 0.0]), (2, [3.0, 0.0, 4.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    rows = {r.vec_id: r.embedding for r in _unit(df, "embedding").collect()}
    assert rows[1] == [0.0, 0.0, 0.0, 0.0]
    assert all(x == x for x in rows[1])  # no NaN
    assert abs(rows[2][0] - 0.6) < 1e-12 and abs(rows[2][2] - 0.8) < 1e-12


def test_zero_vector_never_enters_exact_topk(spark):
    """A padding (all-zero) embedding in the corpus or query set must
    score 0.0 — not NaN — in BOTH exact cosine paths. Spark sorts NaN
    above every double, so before the zero-norm floor a single zero
    vector would rank FIRST in every descending top-k."""
    from nextbus2pg_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_vectorized,
    )

    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),          # padding row
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.where(F.col("vec_id").isin(0, 1))
    for fn in (cosine_topk, cosine_topk_vectorized):
        got = {
            (r.query_id, r.rank): (r.match_id, r.sim)
            for r in fn(emb, queries, "vec_id", "embedding", k=2).collect()
        }
        # query 1: zero vector must NOT outrank real neighbours
        assert got[(1, 1)][0] == 2
        assert all(v == v for _, v in got.values())  # no NaN anywhere
        # zero-vector query scores 0.0 against everything; top-k is
        # then deterministic by id, all sims exactly 0.0
        assert got[(0, 1)] == (1, 0.0) and got[(0, 2)] == (2, 0.0)


def test_pq_sampled_training_recall_floor(spark, ann_frames):
    """The 100 TB training path: codebook trained on a deterministic
    hash-sampled HALF of the corpus (Lloyd scans frac·|corpus| per
    iteration) while encoding still covers every vector. Recall must
    hold the same >= 0.7 floor as full-corpus training — k-means
    quality rides sample coverage of the distribution, not corpus
    size."""
    emb, queries, exact = ann_frames
    book = pq_train(
        emb, "vec_id", "embedding", m=32, n_codes=32, n_iters=2,
        train_fraction=0.5,
    )
    codes = pq_encode(emb, book, "vec_id", "embedding")
    approx = pq_topk(codes, book, queries, "vec_id", "embedding", k=K)
    assert recall_at_k(exact, approx) >= 0.7
    # deterministic: same fraction → byte-identical codebook
    book2 = pq_train(
        emb, "vec_id", "embedding", m=32, n_codes=32, n_iters=2,
        train_fraction=0.5,
    )
    assert sorted(map(tuple, book.collect())) == sorted(
        map(tuple, book2.collect())
    )


def test_deterministic_training_partition_invariant(spark, ann_frames):
    """The round-6 oracle-mode claim, pinned: deterministic=True
    training produces IDENTICAL centroids whatever the input
    partitioning (fold-mean over member-id-sorted lists), where plain
    F.avg may drift in the last ulp. Also pins deterministic ≈ avg
    numerically (same data, same seed, same assignments at these
    settings)."""
    corpus, _, _ = ann_frames
    a = kmeans_centroids(
        corpus, "vec_id", "embedding", n_centroids=8, n_iters=2,
        deterministic=True,
    ).collect()
    b = kmeans_centroids(
        corpus.repartition(17), "vec_id", "embedding", n_centroids=8,
        n_iters=2, deterministic=True,
    ).collect()
    av = {r["centroid_id"]: r["c_vec"] for r in a}
    bv = {r["centroid_id"]: r["c_vec"] for r in b}
    assert av.keys() == bv.keys()
    for cid in av:
        assert av[cid] == bv[cid]  # bit-exact, not approx
    plain = {
        r["centroid_id"]: r["c_vec"]
        for r in kmeans_centroids(
            corpus, "vec_id", "embedding", n_centroids=8, n_iters=2
        ).collect()
    }
    for cid in av:
        for x, y in zip(av[cid], plain[cid]):
            assert x == pytest.approx(y, abs=1e-9)


def test_two_level_assign_exact_when_all_groups_probed(spark):
    """coarse_probe >= n_coarse must reproduce brute-force ivf_assign
    EXACTLY (same tie-breaks) — the calibration identity."""
    from nextbus2pg_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_two_level,
        kmeans_centroids,
    )
    from nextbus2pg_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = kmeans_centroids(emb, "vec_id", "embedding", 16, n_iters=2)
    exact = ivf_assign(emb, "vec_id", "embedding", cents, nprobe=2)
    two = ivf_assign_two_level(
        emb, "vec_id", "embedding", cents,
        nprobe=2, n_coarse=4, coarse_probe=4,
    )
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, two.collect())
    )


def test_two_level_assign_recall_floor(spark):
    """At coarse_probe=2 over 4 groups, most vectors must still land
    on their true nearest centroid — the measured recall lever."""
    from nextbus2pg_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_two_level,
        kmeans_centroids,
    )
    from nextbus2pg_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = kmeans_centroids(emb, "vec_id", "embedding", 16, n_iters=2)
    exact = {
        r.id: r.centroid_id
        for r in ivf_assign(
            emb, "vec_id", "embedding", cents, nprobe=1
        ).collect()
    }
    two = {
        r.id: r.centroid_id
        for r in ivf_assign_two_level(
            emb, "vec_id", "embedding", cents,
            nprobe=1, n_coarse=4, coarse_probe=2,
        ).collect()
    }
    assert set(two) == set(exact)
    recall = sum(1 for i, c in two.items() if exact[i] == c) / len(exact)
    assert recall >= 0.85, recall

    import pytest

    with pytest.raises(ValueError, match="coarse_probe"):
        ivf_assign_two_level(
            emb, "vec_id", "embedding", cents, coarse_probe=0
        )
