"""Scale-primitive tests: bucketed joins eliminate shuffles (plan-level
assertion), salted join/agg match their unsalted results exactly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.operators.scale import (
    count_exchanges,
    salted_agg,
    salted_join,
    write_bucketed,
)
from tests.conftest import SF_DIR_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_DIR_SMALL, "orders")
    lineitem = load_table(spark, SF_DIR_SMALL, "lineitem")
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], n_buckets=8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        lineitem, "b_lineitem", ["l_orderkey"], n_buckets=8,
        sort_cols=["l_orderkey"],
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Co-located join: both sides bucketed on the key → zero shuffles
    in the physical plan (the 100 TB big-big join strategy)."""
    bo, bl = bucketed_tables
    # Disable AQE broadcast conversion so the join strategy under test
    # (bucket-co-located sort-merge) is what actually runs.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(bo).join(
            spark.table(bl),
            spark.table(bo)["o_orderkey"] == spark.table(bl)["l_orderkey"],
        )
        assert count_exchanges(joined) == 0
        # and the result is correct
        plain = load_table(spark, SF_DIR_SMALL, "orders").join(
            load_table(spark, SF_DIR_SMALL, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_shuffles_both_sides(spark):
    """Control: the same join on raw parquet shuffles (≥2 Exchanges)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF_DIR_SMALL, "orders")
        l = load_table(spark, SF_DIR_SMALL, "lineitem")
        joined = o.join(l, o["o_orderkey"] == l["l_orderkey"])
        assert count_exchanges(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_DIR_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = load_table(spark, SF_DIR_SMALL, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = li.join(part, "l_partkey").groupBy("p_brand").count()
    salted = (
        salted_join(li, part, "l_partkey", factor=4)
        .groupBy("p_brand").count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_spreads_identical_hot_key_rows(spark):
    """Byte-identical duplicate rows of one hot key must land in many
    salt buckets — a content hash would map them all to one bucket,
    recreating exactly the straggler task salting exists to split."""
    from nextbus2pg_spark.operators.scale import salted

    hot = spark.range(1).select(
        F.lit("hot").alias("k"), F.lit("same-payload").alias("v")
    )
    dup = hot.crossJoin(spark.range(4000).select("id")).drop("id")
    s = salted(dup, "k", factor=8)
    buckets = s.groupBy("__salt").count().collect()
    assert len(buckets) == 8, buckets
    # Uniform-ish: no bucket hoards more than 2x its fair share.
    assert max(r["count"] for r in buckets) <= 2 * 4000 / 8, buckets


def test_salted_agg_equals_plain_agg(spark):
    li = load_table(spark, SF_DIR_SMALL, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.min("l_orderkey").alias("lo"),
        F.max("l_orderkey").alias("hi"),
    )
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {"n": "count(1)", "qty": "sum(l_quantity)",
         "lo": "min(l_orderkey)", "hi": "max(l_orderkey)"},
        factor=4,
    ).withColumn("qty", F.round(F.col("qty"), 2))
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_write_partitioned_prunes_and_controls_files(spark, tmp_path):
    import glob

    orders = load_table(spark, SF_DIR_SMALL, "orders")
    from nextbus2pg_spark.operators.scale import write_partitioned

    path = str(tmp_path / "orders_by_status")
    write_partitioned(orders, path, ["o_orderstatus"])
    # one file per partition directory (no small-file explosion)
    for d in glob.glob(path + "/o_orderstatus=*"):
        files = [f for f in glob.glob(d + "/*.parquet")]
        assert len(files) == 1
    # read back prunes: the filter appears as a PartitionFilter (whole
    # directories skipped), not a data filter
    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == orders.where(F.col("o_orderstatus") == "F").count()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]


def test_release_cached_rdds_frees_checkpoints(spark):
    from nextbus2pg_spark.operators.scale import release_cached_rdds

    release_cached_rdds(spark)  # start clean
    df = spark.range(100).localCheckpoint(eager=True)
    assert df.count() == 100
    n = release_cached_rdds(spark)
    assert n >= 1
    # The checkpointed frame was fully consumed before release; a
    # second release finds nothing left behind.
    assert release_cached_rdds(spark) == 0


def test_write_bucketed_qualified_name_and_live_table_safety(spark):
    """ADVICE r3: write_bucketed must not hand-compute a delete path
    from the bare table name. For a qualified 'db.tbl' the managed
    location lives under <warehouse>/db.db/tbl; and when the catalog
    already owns the table, DROP TABLE (not a raw directory delete)
    must be what clears it. Re-writing both an unqualified and a
    qualified table twice must succeed and preserve the other table."""
    spark.sql("CREATE DATABASE IF NOT EXISTS wbtest")
    try:
        small = spark.range(10).withColumn("k", F.col("id") % 3)
        write_bucketed(small, "wbtest.t1", ["k"], n_buckets=2)
        write_bucketed(small, "wb_plain", ["k"], n_buckets=2)
        # second write over live catalog entries (the DROP path)
        write_bucketed(small.limit(5), "wbtest.t1", ["k"], n_buckets=2)
        assert spark.table("wbtest.t1").count() == 5
        # the qualified rewrite must not have clobbered the plain table
        assert spark.table("wb_plain").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS wbtest.t1")
        spark.sql("DROP TABLE IF EXISTS wb_plain")
        spark.sql("DROP DATABASE IF EXISTS wbtest")
