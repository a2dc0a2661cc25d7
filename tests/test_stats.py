"""grouped_pearson: hand-computed r/slope, null handling, zero
variance."""

from __future__ import annotations

import pytest


def test_grouped_pearson_hand_computed(spark):
    from nextbus2pg_spark.operators.stats import grouped_pearson

    # Group a: perfect line y = 2x + 1 -> r = 1, slope = 2.
    # Group b: y independent-ish of x.
    rows = [("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),
            ("b", 1.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in grouped_pearson(df, ["g"], "x", "y").collect()}
    assert out["a"].n == 3
    assert out["a"].corr == pytest.approx(1.0)
    assert out["a"].slope == pytest.approx(2.0)
    # zero variance in y -> NULL corr, but slope (y on x) is 0.
    assert out["b"].corr is None
    assert out["b"].slope == pytest.approx(0.0)


def test_grouped_pearson_nulls_drop_pairwise(spark):
    from nextbus2pg_spark.operators.stats import grouped_pearson

    rows = [("a", 1.0, 2.0), ("a", None, 9.0), ("a", 2.0, None),
            ("a", 2.0, 4.0), ("a", 3.0, 6.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = grouped_pearson(df, ["g"], "x", "y").collect()[0]
    assert out.n == 3 and out.corr == pytest.approx(1.0)


def test_grouped_pearson_anticorrelation_and_scale(spark):
    from nextbus2pg_spark.operators.stats import grouped_pearson

    # y = -0.25x + 10 at 2dp scale: r = -1 exactly.
    rows = [("a", float(x), 10.0 - 0.25 * x) for x in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = grouped_pearson(df, ["g"], "x", "y", y_scale=100).collect()[0]
    assert out.corr == pytest.approx(-1.0)
    assert out.slope == pytest.approx(-25.0)  # cents per unit x


def test_chi_squared_hand_computed(spark):
    from nextbus2pg_spark.operators.stats import chi_squared

    # 2x2 table: a={x:10,y:10} vs b; independent-by-construction
    # counts -> chi2 == 0; then a dependent table with known chi2.
    indep = spark.createDataFrame(
        [("x", "u")] * 4 + [("x", "v")] * 4 + [("y", "u")] * 4
        + [("y", "v")] * 4,
        "a string, b string",
    )
    r = chi_squared(indep, "a", "b").collect()[0]
    assert r.chi2 == 0.0 and r.dof == 1 and r.n == 16
    # Perfect association: x->u (5), y->v (5); chi2 = n = 10.
    dep = spark.createDataFrame(
        [("x", "u")] * 5 + [("y", "v")] * 5, "a string, b string"
    )
    r = chi_squared(dep, "a", "b").collect()[0]
    assert r.chi2 == 10.0 and r.dof == 1 and r.n == 10


def test_chi_squared_drops_null_levels(spark):
    from nextbus2pg_spark.operators.stats import chi_squared

    df = spark.createDataFrame(
        [("x", "u"), ("x", None), (None, "v"), ("y", "v")],
        "a string, b string",
    )
    r = chi_squared(df, "a", "b").collect()[0]
    assert r.n == 2 and r.dof == 1
