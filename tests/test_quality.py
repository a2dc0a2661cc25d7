"""Data-quality operator + SQL-string interface tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from nextbus2pg_spark import catalog
from nextbus2pg_spark.operators.quality import enforce, fk_violations, run_checks
from tests.conftest import SF_DIR_SMALL


def test_run_checks_single_pass(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id int, v double"
    )
    counts = run_checks(
        df,
        {
            "v_positive": F.col("v") > 0,       # F6-style CHECK
            "id_nonnull": F.col("id").isNotNull(),
        },
    )
    assert counts == {"v_positive": 2, "id_nonnull": 0}  # NULL counts


def test_enforce_filters_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id int, v double"
    )
    out = enforce(df, {"v_positive": F.col("v") > 0})
    assert [r.id for r in out.collect()] == [1]


def test_fk_violations_on_fixtures(spark):
    li = catalog.load_table(spark, SF_DIR_SMALL, "lineitem")
    orders = catalog.load_table(spark, SF_DIR_SMALL, "orders")
    bad = fk_violations(li, orders, "l_orderkey", "o_orderkey")
    assert bad.count() == 0  # fixtures are referentially intact
    # and a synthetic orphan is caught
    orphan = li.limit(1).withColumn("l_orderkey", F.lit(-999).cast("long"))
    assert fk_violations(li.unionByName(orphan), orders,
                         "l_orderkey", "o_orderkey").count() == 1


def test_sql_string_interface(spark):
    n = catalog.sql(
        spark,
        "SELECT count(*) AS n FROM lineitem WHERE l_quantity > 45",
        SF_DIR_SMALL,
    ).collect()[0].n
    direct = (
        catalog.load_table(spark, SF_DIR_SMALL, "lineitem")
        .where(F.col("l_quantity") > 45)
        .count()
    )
    assert n == direct
    # joins across registered views work too
    top = catalog.sql(
        spark,
        """
        SELECT c.c_mktsegment, count(*) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1 ORDER BY n DESC, c_mktsegment LIMIT 1
        """,
        SF_DIR_SMALL,
    ).collect()
    assert len(top) == 1 and top[0].n > 0


def test_profile_drift_hand_computed(spark):
    from nextbus2pg_spark.operators.quality import profile_drift

    a = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)], "k long, v double"
    )
    b = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, None), (4, None)], "k long, v double"
    )
    out = {r["column"]: r for r in profile_drift(a, b).collect()}
    v = out["v"]
    assert (v["n_nulls_a"], v["n_nulls_b"]) == (1, 3)
    assert v["null_rate_a"] == 0.25 and v["null_rate_b"] == 0.75
    assert v["null_rate_delta"] == 0.5
    assert (v["n_distinct_a"], v["n_distinct_b"]) == (3, 1)
    assert (v["min_a"], v["max_a"]) == (10.0, 40.0)
    assert (v["min_b"], v["max_b"]) == (10.0, 10.0)
    k = out["k"]
    assert k["null_rate_delta"] == 0.0 and k["n_distinct_b"] == 4


def test_profile_drift_defaults_to_shared_columns(spark):
    from nextbus2pg_spark.operators.quality import profile_drift

    a = spark.createDataFrame([(1, "x", 5.0)], "k long, s string, v double")
    b = spark.createDataFrame([(1, "y")], "k long, s string")
    out = profile_drift(a, b).collect()
    assert {r["column"] for r in out} == {"k", "s"}  # v absent in b
