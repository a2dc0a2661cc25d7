"""Connected-components tests: known graph shapes vs a reference
union-find, path-halving convergence on a long chain, and the
dedup_corpus keeper/singleton contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nextbus2pg_spark.operators.components import (
    connected_components,
    dedup_corpus,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference union-find: node → min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _run(spark, edges: list[tuple[int, int]]):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["id"], r["component"])
        for r in connected_components(df).collect()
    }
    want = set(_uf_components(edges).items())
    assert got == want


def test_two_disjoint_components(spark):
    _run(spark, [(1, 2), (2, 3), (10, 11)])


def test_star_and_reversed_duplicate_edges(spark):
    _run(spark, [(5, 1), (5, 2), (5, 3), (1, 5), (2, 5)])


def test_long_chain_converges_in_log_rounds(spark):
    # Diameter 63: plain min-propagation needs 63 rounds; path halving
    # must finish well inside the default max_iter=25.
    chain = [(i, i + 1) for i in range(64)]
    _run(spark, chain)


def test_self_loops_ignored_and_empty_edges(spark):
    df = spark.createDataFrame([(7, 7)], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_dedup_corpus_keeps_min_id_and_singletons(spark):
    corpus = spark.range(10).withColumnRenamed("id", "doc_id")
    comp = connected_components(
        spark.createDataFrame([(3, 5), (5, 9)], "id_a long, id_b long")
    )
    kept = sorted(
        r["doc_id"] for r in dedup_corpus(corpus, "doc_id", comp).collect()
    )
    # 5 and 9 collapse into 3; everything untouched survives.
    assert kept == [0, 1, 2, 3, 4, 6, 7, 8]


def test_unconverged_raises(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_connected_components_rejects_string_ids(spark):
    """cast('long') on string edge ids silently empties the edge set;
    the operator must fail loudly instead (hash string ids first)."""
    edges = spark.createDataFrame(
        [("doc-1", "doc-2")], "id_a string, id_b string"
    )
    with pytest.raises(TypeError, match="integral"):
        connected_components(edges)


def test_dedup_keep_best_keeps_highest_score(spark):
    from nextbus2pg_spark.operators.components import dedup_keep_best

    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (9, 0.1)],
        "doc_id long, score double",
    )
    # {1,2,3} one component (label 1), {4} trivially clustered alone
    # via a self-labeled row, 9 untouched singleton.
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "id long, component long"
    )
    kept = sorted(
        r.doc_id for r in dedup_keep_best(df, "doc_id", comp, "score").collect()
    )
    # component 1: max score 0.9 tie between 2 and 3 -> smaller id 2.
    assert kept == [2, 4, 9]
