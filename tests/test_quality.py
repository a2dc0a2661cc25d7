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
