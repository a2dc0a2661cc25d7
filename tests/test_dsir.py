"""DSIR importance resampling (operators/curation.dsir_sample) and
Johnson-Lindenstrauss random projection (operators/pca.random_projection)
behavior tests — the fixture oracles pin engine parity; these pin
SEMANTICS (target-likeness ordering, JL linearity/determinism)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nextbus2pg_spark.operators.curation import dsir_sample
from nextbus2pg_spark.operators.pca import random_projection


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_ranks_target_like_docs_first(spark):
    target = _docs(spark, [
        (100, "quantum entanglement decoherence qubit gate"),
        (101, "qubit error correction surface code decoherence"),
    ])
    candidates = _docs(spark, [
        (1, "qubit decoherence and entanglement in a quantum gate"),
        (2, "football match score goal referee penalty"),
        (3, "quantum gate teleportation qubit"),
        (4, "recipe butter flour sugar oven bake"),
    ])
    out = dsir_sample(
        candidates, target, "doc_id", "text", n_buckets=64, k=4
    ).collect()
    rank = {r.id: r.rank for r in out}
    assert len(rank) == 4
    # the two physics docs must outrank the two off-domain docs
    assert {i for i, r in rank.items() if r <= 2} == {1, 3}


def test_dsir_k_truncates_and_validates(spark):
    target = _docs(spark, [(10, "alpha beta gamma")])
    cands = _docs(spark, [(i, f"alpha doc {i}") for i in range(6)])
    out = dsir_sample(cands, target, "doc_id", "text", k=3).collect()
    assert len(out) == 3
    assert sorted(r.rank for r in out) == [1, 2, 3]
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_sample(cands, target, "doc_id", "text", n_buckets=1)
    with pytest.raises(ValueError, match="k >= 1"):
        dsir_sample(cands, target, "doc_id", "text", k=0)


def test_dsir_handles_empty_and_single_word_docs(spark):
    """0/1-word candidates produce no bigrams (the slice guard) and
    empty-text docs simply score nothing — no crash either way."""
    target = _docs(spark, [(10, "alpha beta")])
    cands = _docs(spark, [(1, "alpha"), (2, ""), (3, "alpha beta gamma")])
    out = dsir_sample(cands, target, "doc_id", "text", k=5).collect()
    ids = {r.id for r in out}
    assert 3 in ids and 1 in ids
    assert 2 not in ids  # featureless doc never scores


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, v array<float>")


def test_random_projection_is_deterministic_and_linear(spark):
    base = [float((i * 7) % 13) for i in range(16)]
    doubled = [2.0 * x for x in base]
    df = _vecs(spark, [(1, base), (2, doubled), (3, base)])
    out = random_projection(df, "vec_id", "v", in_dim=16, out_dim=4)
    rows = {(r.id, r.j): r.proj for r in out.collect()}
    assert len(rows) == 12
    for j in range(4):
        assert rows[(1, j)] == rows[(3, j)]  # deterministic
        assert rows[(2, j)] == pytest.approx(2 * rows[(1, j)], abs=1e-6)


def test_random_projection_preserves_scale_on_average(spark):
    """JL sanity: E[|proj|^2] = |x|^2 under the 1/sqrt(k) Rademacher
    scaling — check the ratio is within a loose factor on one vector."""
    import numpy as np

    rng = np.random.RandomState(5)
    x = [float(v) for v in rng.normal(size=32)]
    df = _vecs(spark, [(1, x)])
    out = random_projection(df, "vec_id", "v", in_dim=32, out_dim=16)
    proj = [r.proj for r in out.collect()]
    assert len(proj) == 16
    ratio = sum(p * p for p in proj) / sum(v * v for v in x)
    assert 0.4 < ratio < 2.5


def test_random_projection_validates(spark):
    df = _vecs(spark, [(1, [1.0, 2.0])])
    with pytest.raises(ValueError, match="out_dim"):
        random_projection(df, "vec_id", "v", in_dim=2, out_dim=0)


def test_random_projection_no_shuffle_of_corpus(spark):
    """Scale shape: the corpus side must be exchange-free — signs
    broadcast onto a map pass. Assert no Exchange above the corpus
    scan (the broadcast side's exchange is expected)."""
    df = _vecs(spark, [(i, [float(i), 1.0]) for i in range(100)])
    plan = random_projection(
        df, "vec_id", "v", in_dim=2, out_dim=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    # no shuffle exchange anywhere: the only join is broadcast
    assert "ShuffleExchange" not in plan and "SortMergeJoin" not in plan


def test_dsir_is_partition_invariant(spark):
    """The FP fold discipline as a property: per-doc scores fold terms
    in bucket order regardless of physical layout, so the selected
    (id, rank) set is IDENTICAL at 1 and 7 partitions — a plain
    float SUM would reorder additions and could flip near ties."""
    rows = [
        (i, " ".join(f"w{(i * j) % 29}" for j in range(12)))
        for i in range(60)
    ]
    target = _docs(spark, [(1000, "w1 w2 w3 w4 w5 w6")])
    outs = []
    for n_parts in (1, 7):
        cands = _docs(spark, rows).repartition(n_parts)
        outs.append(sorted(
            map(tuple, dsir_sample(
                cands, target, "doc_id", "text", n_buckets=64, k=20
            ).collect())
        ))
    assert outs[0] == outs[1]


def test_random_projection_is_partition_invariant(spark):
    rows = [(i, [float((i * 13 + j * 7) % 17) for j in range(8)])
            for i in range(50)]
    outs = []
    for n_parts in (1, 5):
        df = _vecs(spark, rows).repartition(n_parts)
        outs.append(sorted(map(tuple, random_projection(
            df, "vec_id", "v", in_dim=8, out_dim=4
        ).collect())))
    assert outs[0] == outs[1]
