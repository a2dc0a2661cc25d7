"""Batch-perceptron classifier tests: separable-data convergence,
determinism-mode equivalence and partition invariance, guards, and
the fixture model's learned accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.operators.classifier import (
    classify,
    hash_features,
    perceptron_train,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def toy(spark):
    """Linearly separable two-word vocabulary: class +1 says 'good',
    class -1 says 'bad'; a few shared filler words."""
    rows = []
    for i in range(20):
        rows.append((i, "good text filler common", 1.0))
        rows.append((100 + i, "bad text filler common", -1.0))
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "id long, y double"
    )
    feats = hash_features(docs, "doc_id", "text", dim=32, binary=True)
    return feats.localCheckpoint(eager=True), labels.localCheckpoint(
        eager=True
    )


def test_separable_data_converges(spark, toy):
    feats, labels = toy
    w = perceptron_train(feats, labels, dim=32, n_iters=10)
    scored = classify(feats, w).join(labels, "id")
    acc = scored.agg(
        F.avg((F.col("pred") == F.col("y").cast("int")).cast("double"))
    ).collect()[0][0]
    assert acc == 1.0


def test_deterministic_matches_plain(spark, toy):
    feats, labels = toy
    a = {
        r["feat"]: r["w"]
        for r in perceptron_train(feats, labels, dim=32, n_iters=5).collect()
    }
    b = {
        r["feat"]: r["w"]
        for r in perceptron_train(
            feats, labels, dim=32, n_iters=5, deterministic=True
        ).collect()
    }
    assert a.keys() == b.keys() and len(a) == 32
    for f in a:
        assert b[f] == pytest.approx(a[f], abs=1e-12)


def test_deterministic_training_partition_invariant(spark, toy):
    feats, labels = toy
    a = {
        r["feat"]: r["w"]
        for r in perceptron_train(
            feats, labels, dim=32, n_iters=5, deterministic=True
        ).collect()
    }
    b = {
        r["feat"]: r["w"]
        for r in perceptron_train(
            feats.repartition(13), labels, dim=32, n_iters=5,
            deterministic=True,
        ).collect()
    }
    for f in a:
        assert b[f] == a[f]  # bit-exact


def test_bad_labels_rejected(spark, toy):
    feats, _ = toy
    bad = spark.createDataFrame([(0, 0.0), (100, 1.0)], "id long, y double")
    with pytest.raises(ValueError, match="-1.0 or \\+1.0"):
        perceptron_train(feats, bad, dim=32)


def test_bad_dim_rejected(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="dim"):
        hash_features(docs, "doc_id", "text", dim=0)


def test_zero_margin_predicts_positive(spark):
    feats = spark.createDataFrame(
        [(1, 0, 1.0)], "id long, feat long, val double"
    )
    w = spark.createDataFrame([(0, 0.0)], "feat long, w double")
    row = classify(feats, w).collect()[0]
    assert row["margin"] == 0.0 and row["pred"] == 1


def test_binary_features_are_presence(spark):
    docs = spark.createDataFrame(
        [(1, "x x x y")], "doc_id long, text string"
    )
    counts = {
        r["feat"]: r["val"]
        for r in hash_features(docs, "doc_id", "text", dim=64).collect()
    }
    binary = {
        r["feat"]: r["val"]
        for r in hash_features(
            docs, "doc_id", "text", dim=64, binary=True
        ).collect()
    }
    assert sorted(counts.values()) == [1.0, 3.0]
    assert sorted(binary.values()) == [1.0, 1.0]
    assert counts.keys() == binary.keys()


def test_fixture_model_learns_the_keyword(spark):
    """The q_quality_classifier config (1024 binary features, 16
    iterations) must actually separate the weak label on the fixture
    corpus — the point of the filter, beyond replaying exactly."""
    docs = load_table(spark, SF_DIR, "documents")
    feats = hash_features(docs, "doc_id", "text", dim=1024, binary=True)
    words = F.filter(F.split("text", " "), lambda w: w != "")
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(F.array_contains(words, "spark"), F.lit(1.0))
        .otherwise(F.lit(-1.0))
        .alias("y"),
    )
    w = perceptron_train(feats, labels, dim=1024, n_iters=16)
    scored = classify(feats, w).join(labels, "id")
    agg = scored.agg(
        F.avg((F.col("pred") == F.col("y").cast("int")).cast("double")).alias(
            "acc"
        ),
        F.avg((F.col("y") == 1.0).cast("double")).alias("base"),
    ).collect()[0]
    assert agg["acc"] >= 0.95
    assert agg["acc"] > agg["base"] + 0.1  # beats majority, not memorizing it
