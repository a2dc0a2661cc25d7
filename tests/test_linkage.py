"""Fuzzy record linkage (operators/linkage.py): deletion-neighborhood
blocking must have EXACT recall vs the brute-force definition, and the
verify step must keep only true edit-distance matches."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from nextbus2pg_spark.operators.linkage import deletion_variants, fuzzy_join


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_fuzzy_join_hand_pairs(spark):
    left = _df(spark, [(1, "smith"), (2, "jon"), (3, "abc")])
    right = _df(spark, [(10, "smyth"), (11, "john"), (12, "xyz"),
                        (13, "Smith")])
    out = {(r["left_id"], r["right_id"]): r["dist"] for r in fuzzy_join(
        left, right, "id", "id", "name", "name", max_dist=1
    ).collect()}
    assert out == {(1, 10): 1, (1, 13): 0, (2, 11): 1}


def test_case_normalization_is_optional(spark):
    left = _df(spark, [(1, "smith")])
    right = _df(spark, [(13, "Smith")])
    raw = fuzzy_join(left, right, "id", "id", "name", "name",
                     max_dist=1, lowercase=False).collect()
    assert [(r["left_id"], r["right_id"], r["dist"]) for r in raw] == [
        (1, 13, 1)  # the case difference IS a substitution when raw
    ]


def test_k2_catches_transpositions(spark):
    left = _df(spark, [(1, "ab")])
    right = _df(spark, [(2, "ba")])
    assert fuzzy_join(left, right, "id", "id", "name", "name",
                      max_dist=1).isEmpty()
    out = fuzzy_join(left, right, "id", "id", "name", "name",
                     max_dist=2).collect()
    assert [(r["left_id"], r["right_id"], r["dist"]) for r in out] == [
        (1, 2, 2)
    ]


@pytest.mark.parametrize("k", [1, 2])
def test_exact_recall_vs_brute_force(spark, k):
    """Every pair the definition admits must come back (completeness)
    and nothing else (the verify filter): all strings of length <= 4
    over {a, b} — 31 strings, 465 pairs, every edit pattern incl. the
    empty string."""
    strings = [""] + [
        "".join(p)
        for n in range(1, 5)
        for p in itertools.product("ab", repeat=n)
    ]
    rows = list(enumerate(strings))
    df = _df(spark, rows)
    got = {
        (r["left_id"], r["right_id"]): r["dist"]
        for r in fuzzy_join(
            df, df, "id", "id", "name", "name", max_dist=k
        ).collect()
        if r["left_id"] < r["right_id"]
    }
    brute = {
        (r["a"], r["b"]): r["d"]
        for r in df.alias("x")
        .crossJoin(df.alias("y"))
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a"), F.col("y.id").alias("b"),
            F.levenshtein(F.col("x.name"), F.col("y.name")).alias("d"),
        )
        .where(F.col("d") <= k)
        .collect()
    }
    assert got == brute


def test_deletion_variants_shape(spark):
    df = spark.createDataFrame([("abc",), ("",)], "s string")
    v1 = df.select(deletion_variants(F.col("s"), 1).alias("v")).collect()
    assert sorted(v1[0]["v"]) == ["ab", "abc", "ac", "bc"]
    assert v1[1]["v"] == [""]  # empty string: itself only, no [1,0] trap
    v2 = df.select(deletion_variants(F.col("s"), 2).alias("v")).collect()
    assert set(v2[0]["v"]) == {"abc", "ab", "ac", "bc", "a", "b", "c"}


def test_long_text_raises_at_execution(spark):
    """The variant-blowup guard (ADVICE r7): deletion neighborhoods are
    O(len^k) per string, so texts past max_len must raise with a
    pointer at the banded near-dup family — not fan out silently."""
    left = _df(spark, [(1, "x" * 80)])
    right = _df(spark, [(2, "y" * 3)])
    with pytest.raises(Exception, match="max_len"):
        fuzzy_join(
            left, right, "id", "id", "name", "name", max_dist=1
        ).collect()
    # Raising the bound deliberately admits the same row.
    ok = fuzzy_join(
        left, right, "id", "id", "name", "name", max_dist=1, max_len=100
    )
    assert ok.isEmpty()  # no matches, but no error either


def test_long_text_guard_ignores_nulls(spark):
    """NULL texts are filtered, never guarded — a NULL row must not trip
    the raise_error branch regardless of expression evaluation order."""
    left = _df(spark, [(1, None), (2, "abc")])
    right = _df(spark, [(10, "abd")])
    out = fuzzy_join(
        left, right, "id", "id", "name", "name", max_dist=1, max_len=5
    ).collect()
    assert [(r["left_id"], r["right_id"], r["dist"]) for r in out] == [
        (2, 10, 1)
    ]


def test_max_dist_above_two_rejected(spark):
    left = _df(spark, [(1, "abc")])
    with pytest.raises(ValueError, match="k must be 1 or 2"):
        fuzzy_join(left, left, "id", "id", "name", "name", max_dist=3)
