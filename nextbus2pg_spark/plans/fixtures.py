"""Reference-parity fixture queries (SURVEY.md §2, operator rows cited
per query) plus the standard aggregate/window surface.

Every query here is a *thin plan builder* over the operator library and
built-in DataFrame functions — declarative, so Catalyst gets pushdown /
pruning / join-strategy selection for free. Each carries the DuckDB
oracle SQL that defines its semantics engine-independently.

Cross-engine hash-match rules observed throughout:
- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded in BOTH engines (FP summation order is
  engine/partition dependent; rounding makes the contract exact);
- integer sums are cast to BIGINT in SQL (DuckDB widens to HUGEINT);
- event timestamps flow as epoch-µs longs or µs timestamp_ntz (the
  catalog normalizes the parquet ns encoding identically to DuckDB).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.functions import scalar as fx
from nextbus2pg_spark.operators import keyed_write as kw
from nextbus2pg_spark.operators.joins import (
    broadcast_lookup,
    first_per_group,
    top1_per_group,
)
from nextbus2pg_spark.plans.registry import fixture

# Incremental-scan offset: 2024-01-20T00:00:00Z in epoch µs (events span
# 2024-01-01..2024-01-30).
OFFSET_US = 1_705_708_800_000_000


# ---------------------------------------------------------------------------
# §2.1 sources / scans
# ---------------------------------------------------------------------------

@fixture(
    "q_scan_full",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def q_scan_full(spark: SparkSession, sf_dir: str):
    """S1: full snapshot scan (``agency.py:14-17``)."""
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@fixture(
    "q_scan_filtered",
    oracle=(
        "SELECT c_custkey, c_name, c_acctbal FROM customer "
        "WHERE c_mktsegment = 'BUILDING'"
    ),
)
def q_scan_filtered(spark: SparkSession, sf_dir: str):
    """S2/S5/F1: parameterized scan, predicate pushed to the source
    (``agency.py:44-48``, ``agency.py:80-85``). ``.explain`` shows the
    filter in PushedFilters."""
    return (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
    )


@fixture(
    "q_scan_incremental",
    oracle=(
        "SELECT event_id, ts, user_id, event_type, value FROM events "
        f"WHERE epoch_us(ts) > {OFFSET_US}"
    ),
)
def q_scan_incremental(spark: SparkSession, sf_dir: str):
    """S4/T2: incremental fetch from an offset (``route.py:151-155``).

    Filters on the physical time column (in its native parquet type) so
    the predicate reaches the parquet scan — the batch analogue of the
    streaming source offset. See ``catalog.events_after``.
    """
    from nextbus2pg_spark.catalog import events_after

    return events_after(spark, sf_dir, OFFSET_US).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# §2.2 sinks (as batch-visible semantics; physical sinks in sinks/)
# ---------------------------------------------------------------------------

_UPSERT_ORACLE = """
WITH incoming AS (
  SELECT c_custkey, upper(c_name) AS c_name, c_nationkey,
         c_acctbal + 100.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, c_name, c_nationkey,
         CAST(0.0 AS DOUBLE), 'NEW'
  FROM customer WHERE c_custkey % 13 = 0
)
SELECT coalesce(e.c_custkey, i.c_custkey) AS c_custkey,
       CASE WHEN i.c_custkey IS NOT NULL THEN i.c_name ELSE e.c_name END AS c_name,
       CASE WHEN e.c_custkey IS NOT NULL THEN e.c_nationkey ELSE i.c_nationkey END AS c_nationkey,
       CASE WHEN i.c_custkey IS NOT NULL THEN i.c_acctbal ELSE e.c_acctbal END AS c_acctbal,
       CASE WHEN i.c_custkey IS NOT NULL THEN i.c_mktsegment ELSE e.c_mktsegment END AS c_mktsegment
FROM customer e FULL OUTER JOIN incoming i ON e.c_custkey = i.c_custkey
"""


@fixture("q_upsert_semantics", oracle=_UPSERT_ORACLE)
def q_upsert_semantics(spark: SparkSession, sf_dir: str):
    """K1/K2: upsert — existing wins keys + stable cols, incoming wins
    payload (``agency.py:26-37,60-71``). ``c_nationkey`` plays the
    surrogate-id role (stable on match)."""
    base = load_table(spark, sf_dir, "customer")
    updates = base.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("c_name"),
        "c_nationkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    inserts = base.where(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    incoming = updates.unionByName(inserts)
    return kw.upsert_batch(
        base,
        incoming,
        key_cols=["c_custkey"],
        update_cols=["c_name", "c_acctbal", "c_mktsegment"],
        null_safe=False,
        dedup_incoming=False,
    )


_SCD2_ORACLE = """
WITH cur AS (
  SELECT c_custkey, c_name, c_acctbal,
         DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
  FROM customer
),
inc AS (
  SELECT c_custkey, upper(c_name) AS c_name,
         c_acctbal + 100.0 AS c_acctbal
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, c_name, CAST(0.0 AS DOUBLE)
  FROM customer WHERE c_custkey % 13 = 0
),
j AS (
  SELECT cur.c_custkey, cur.c_name, cur.c_acctbal,
         cur.valid_from, cur.valid_to,
         inc.c_custkey AS i_key, inc.c_name AS i_name,
         inc.c_acctbal AS i_bal,
         (inc.c_name IS NOT DISTINCT FROM cur.c_name
          AND inc.c_acctbal IS NOT DISTINCT FROM cur.c_acctbal) AS same
  FROM cur FULL OUTER JOIN inc ON cur.c_custkey = inc.c_custkey
)
SELECT c_custkey, c_name, c_acctbal, valid_from, valid_to
FROM j WHERE c_custkey IS NOT NULL AND (i_key IS NULL OR same)
UNION ALL
SELECT c_custkey, c_name, c_acctbal, valid_from, DATE '2024-06-01'
FROM j WHERE c_custkey IS NOT NULL AND i_key IS NOT NULL AND NOT same
UNION ALL
SELECT i_key, i_name, i_bal, DATE '2024-06-01', CAST(NULL AS DATE)
FROM j WHERE i_key IS NOT NULL AND (c_custkey IS NULL OR NOT same)
"""


@fixture("q_scd2_merge", oracle=_SCD2_ORACLE)
def q_scd2_merge(spark: SparkSession, sf_dir: str):
    """SCD Type-2 dimension merge: the queryable-history form of the
    reference's re-snapshot pattern (``service_stop_order`` keeps every
    day's version under an ``update_timestamp``,
    ``sql/create_tables.sql:88-110``). Changed keys close their open
    row at the batch date and insert a new open version; unchanged and
    unmatched keys pass through — idempotent on re-apply. One
    full-outer equi-join on the business key; closed rows never join."""
    from nextbus2pg_spark.operators.scd2 import scd2_bootstrap, scd2_merge

    import datetime as _dt

    base = load_table(spark, sf_dir, "customer")
    history = scd2_bootstrap(
        base,
        key="c_custkey",
        tracked=["c_name", "c_acctbal"],
        batch_date=_dt.date(2024, 1, 1),
    )
    updates = base.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("c_name"),
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
    )
    inserts = base.where(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "c_name",
        F.lit(0.0).alias("c_acctbal"),
    )
    return scd2_merge(
        history,
        updates.unionByName(inserts),
        key="c_custkey",
        tracked=["c_name", "c_acctbal"],
        batch_date=_dt.date(2024, 6, 1),
    )


@fixture(
    "q_scd2_as_of",
    oracle=f"""
WITH hist AS ({_SCD2_ORACLE.strip()})
SELECT c_custkey, c_name, c_acctbal, valid_from
FROM hist
WHERE valid_from <= DATE '2024-03-01'
  AND (valid_to IS NULL OR valid_to > DATE '2024-03-01')
""",
)
def q_scd2_as_of(spark: SparkSession, sf_dir: str):
    """Point-in-time read over the SCD2 history: the dimension exactly
    as it stood between the two merges (time travel without a
    transactional table format — a filter on the validity interval,
    pushable to the scan)."""
    from nextbus2pg_spark.operators.scd2 import scd2_as_of

    import datetime as _dt

    hist = q_scd2_merge(spark, sf_dir)
    return scd2_as_of(hist, _dt.date(2024, 3, 1)).select(
        "c_custkey", "c_name", "c_acctbal", "valid_from"
    )


@fixture(
    "q_null_safe_key",
    oracle="""
WITH tagged AS (
  SELECT event_id, nullif(event_type, 'error') AS svc_tag FROM events
),
dim AS (SELECT DISTINCT svc_tag FROM tagged)
SELECT coalesce(d.svc_tag, '<none>') AS key_tag, count(*) AS n
FROM tagged e JOIN dim d ON e.svc_tag IS NOT DISTINCT FROM d.svc_tag
GROUP BY coalesce(d.svc_tag, '<none>')
""",
)
def q_null_safe_key(spark: SparkSession, sf_dir: str):
    """K3/X7: NULL-tolerant business key — NULL collides with NULL, once
    (``sql/create_tables.sql:62-63``, ``agency.py:100``)."""
    tagged = load_table(spark, sf_dir, "events").select(
        "event_id", F.nullif(F.col("event_type"), F.lit("error")).alias("svc_tag")
    )
    dim = tagged.select("svc_tag").distinct()
    return (
        tagged.alias("e")
        .join(dim.alias("d"), fx.null_safe_eq(F.col("e.svc_tag"), F.col("d.svc_tag")))
        .groupBy(F.coalesce(F.col("d.svc_tag"), F.lit("<none>")).alias("key_tag"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@fixture(
    "q_dedup_keys",
    oracle=(
        "SELECT DISTINCT l_orderkey, l_returnflag, l_linestatus FROM lineitem"
    ),
)
def q_dedup_keys(spark: SparkSession, sf_dir: str):
    """K4/K6/A1/A2: DISTINCT-ON dedup grain (``agency.py:184,316-317``).
    Key-columns-only output so the survivor choice can't diverge
    (SURVEY.md §7 hard-part #2)."""
    return kw.append_dedup(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_linestatus"
        ),
        ["l_orderkey", "l_returnflag", "l_linestatus"],
    )


@fixture(
    "q_insert_if_absent",
    oracle="""
WITH existing AS (
  SELECT o_orderkey AS okey, 'existing' AS src FROM orders WHERE o_orderstatus = 'F'
),
incoming AS (SELECT DISTINCT l_orderkey AS okey FROM lineitem)
SELECT okey, src FROM existing
UNION ALL
SELECT i.okey, 'inserted' AS src FROM incoming i
WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.okey = i.okey)
""",
)
def q_insert_if_absent(spark: SparkSession, sf_dir: str):
    """K5: ON CONFLICT DO NOTHING = left-anti + union
    (``agency.py:221-232``)."""
    existing = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("okey"), F.lit("existing").alias("src"))
    )
    incoming = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.lit("inserted").alias("src"))
    )
    return kw.insert_if_absent(existing, incoming, ["okey"])


@fixture(
    "q_point_struct",
    oracle="""
SELECT s_suppkey,
       CAST(s_acctbal AS DOUBLE) AS lon,
       CAST(s_nationkey AS DOUBLE) AS lat,
       printf('POINT(%.6f %.6f)', CAST(s_acctbal AS DOUBLE),
              CAST(s_nationkey AS DOUBLE)) AS point_text
FROM supplier
""",
)
def q_point_struct(spark: SparkSession, sf_dir: str):
    """K8/X9/X10: geometry-as-struct + byte-stable canonical text
    (``agency.py:179,308``; ``sql/create_tables.sql:86``)."""
    sup = load_table(spark, sf_dir, "supplier")
    p = fx.point_struct(F.col("s_acctbal"), F.col("s_nationkey"))
    return sup.select(
        "s_suppkey",
        p["lon"].alias("lon"),
        p["lat"].alias("lat"),
        fx.point_text(p).alias("point_text"),
    )


# ---------------------------------------------------------------------------
# §2.3 projections / computed columns
# ---------------------------------------------------------------------------

@fixture(
    "q_project_rename",
    oracle=(
        "SELECT n_nationkey AS nation_key, n_name AS nation_name, "
        "n_regionkey AS region_key FROM nation"
    ),
)
def q_project_rename(spark: SparkSession, sf_dir: str):
    """P1: attribute projection + rename (``agency.py:19-23``)."""
    return load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nation_key"),
        F.col("n_name").alias("nation_name"),
        F.col("n_regionkey").alias("region_key"),
    )


@fixture(
    "q_keygen_uuid",
    oracle=(
        "SELECT count(*) AS n_rows, count(*) AS n_valid_uuid, "
        "count(*) AS n_distinct_uuid FROM nation"
    ),
)
def q_keygen_uuid(spark: SparkSession, sf_dir: str):
    """P2: surrogate key generation (``agency.py:51-56`` uuid4).

    The uuids themselves are nondeterministic, so the checkable output
    is the generator's INVARIANTS as deterministic aggregates: every
    row got a key, every key matches the RFC-4122 v4 shape Spark's
    ``uuid()`` emits, and all keys are distinct. The oracle states the
    same three counts off the row count alone — any generator bug
    (null, malformed, colliding keys) breaks the hash match.
    """
    v4 = (
        "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}"
        "-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    keyed = load_table(spark, sf_dir, "nation").select(
        F.expr("uuid()").alias("nation_uuid")
    )
    return keyed.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("nation_uuid").rlike(v4), 1)).alias(
            "n_valid_uuid"
        ),
        F.countDistinct("nation_uuid").alias("n_distinct_uuid"),
    )


@fixture(
    "q_bool_cast",
    oracle=(
        "SELECT o_orderkey, (o_orderstatus = 'F') AS is_filled FROM orders"
    ),
)
def q_bool_cast(spark: SparkSession, sf_dir: str):
    """P3/X5: string-compare boolean (``route.py:33,203`` —
    ``i.get('useForUI') == 'true'``; here the flag string is a status)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", (F.col("o_orderstatus") == "F").alias("is_filled")
    )


@fixture(
    "q_project_filter",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
FROM lineitem WHERE l_returnflag = 'R'
""",
)
def q_project_filter(spark: SparkSession, sf_dir: str):
    """P4/F1: path-scoped projection → filter + select
    (``route.py:64-71``)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    )


@fixture(
    "q_posexplode",
    oracle="""
SELECT vec_id,
       CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
       CAST(unnest(embedding) AS DOUBLE) AS val
FROM embeddings
""",
)
def q_posexplode(spark: SparkSession, sf_dir: str):
    """P5: nested traversal → rows with position (``route.py:124-128``)."""
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select("vec_id", F.col("pos").cast("int").alias("pos"),
                F.col("val").cast("double").alias("val"))
    )


@fixture(
    "q_event_time_derive",
    oracle="""
SELECT event_id,
       epoch_us(ts) - CAST(round(value * 1000000) AS BIGINT) AS derived_us,
       make_timestamp(epoch_us(ts) - CAST(round(value * 1000000) AS BIGINT)) AS derived_ts
FROM events
""",
)
def q_event_time_derive(spark: SparkSession, sf_dir: str):
    """P6/X2: event time = request time − secsSinceReport
    (``route.py:197-204``), exact µs-integer arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    derived_us = (
        F.col("ts_us")
        - F.round(F.col("value") * F.lit(1000000.0), 0).cast("long")
    )
    return ev.select(
        "event_id",
        derived_us.alias("derived_us"),
        F.timestamp_micros(derived_us).cast("timestamp_ntz").alias("derived_ts"),
    )


@fixture(
    "q_feed_transform",
    oracle="""
SELECT 'r0' AS route_tag,
       event_type AS dir_tag,
       CAST(user_id AS VARCHAR) AS vehicle_tag,
       CAST(value - 250.0 AS DOUBLE) AS lon,
       CAST(value / 10.0 AS DOUBLE) AS lat,
       make_timestamp(
         CAST(round((epoch_us(ts) // 1000) / 1000.0) AS BIGINT) * 1000000
         - 30000000
       ) AS location_timestamp,
       (event_id % 2 = 0) AS is_predictable
FROM events
""",
)
def q_feed_transform(spark: SparkSession, sf_dir: str):
    """The reference's hot-path ingest transform as one checkable
    relation (``route.py:156-204``): raw wire-format strings → typed
    vehicle rows. Composes ``events_as_feed`` (the fixture adapter that
    renders events as raw feed strings) with
    ``streaming/ingest.transform_feed`` — so the driver hash-checks
    the exact projection the streaming pipeline runs per micro-batch:
    string casts, ``predictable == 'true'``, the point struct, and the
    rounded request-time minus secs_since_report event time. The
    struct is flattened to (lon, lat) for the column-wise compare."""
    from nextbus2pg_spark.sources.feed import events_as_feed
    from nextbus2pg_spark.streaming.ingest import transform_feed

    raw = events_as_feed(load_table(spark, sf_dir, "events"))
    v = transform_feed(raw)
    return v.select(
        "route_tag",
        "dir_tag",
        "vehicle_tag",
        F.col("vehicle_location.lon").alias("lon"),
        F.col("vehicle_location.lat").alias("lat"),
        F.col("location_timestamp").cast("timestamp_ntz").alias(
            "location_timestamp"
        ),
        "is_predictable",
    )


@fixture(
    "q_string_format",
    oracle=(
        "SELECT printf('nation-%03d:%s', n_nationkey, n_name) AS tag, "
        "n_nationkey FROM nation"
    ),
)
def q_string_format(spark: SparkSession, sf_dir: str):
    """P7/X8: URL-style string formatting (``route.py:9,21-23``)."""
    return load_table(spark, sf_dir, "nation").select(
        F.format_string("nation-%03d:%s", F.col("n_nationkey"), F.col("n_name")).alias("tag"),
        "n_nationkey",
    )


# ---------------------------------------------------------------------------
# §2.4 filters & §2.5 joins
# ---------------------------------------------------------------------------

@fixture(
    "q_anti_join",
    oracle="""
SELECT p_partkey, p_name FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45
)
""",
)
def q_anti_join(spark: SparkSession, sf_dir: str):
    """F4/J3/U2: set-difference anti join (``route.py:76-78``):
    parts never shipped in bulk."""
    part = load_table(spark, sf_dir, "part")
    bulk = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    return part.join(
        bulk, part["p_partkey"] == bulk["l_partkey"], "left_anti"
    ).select("p_partkey", "p_name")


@fixture(
    "q_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-01-01'
)
""",
)
def q_semi_join(spark: SparkSession, sf_dir: str):
    """F5/J7: existence check = left-semi join (``agency.py:145``)."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    return cust.join(
        recent, cust["c_custkey"] == recent["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


@fixture(
    "q_check_positive",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 0
""",
)
def q_check_positive(spark: SparkSession, sf_dir: str):
    """F6: CHECK (x > 0) as a pre-write assertion filter
    (``sql/create_tables.sql:106-107``)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@fixture(
    "q_join_inner",
    oracle="""
SELECT o.o_orderkey, c.c_custkey, c.c_name, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str):
    """J1: equi inner join (``agency.py:205-213``)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@fixture(
    "q_join_broadcast",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_type
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str):
    """J2: dict-probe lookup → broadcast hash join (``agency.py:264``).
    The fact side never shuffles — the 100 TB-critical join shape."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    return broadcast_lookup(li, part.select("l_partkey", "p_brand", "p_type"), "l_partkey").select(
        "l_orderkey", "l_linenumber", "p_brand", "p_type"
    )


@fixture(
    "q_join_left_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN (
  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
) o ON o.o_custkey = c.c_custkey
""",
)
def q_join_left_outer(spark: SparkSession, sf_dir: str):
    """J4: left-outer enrichment with NULL fallback (``agency.py:141-170``)."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    return cust.join(
        recent, cust["c_custkey"] == recent["o_custkey"], "left_outer"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@fixture(
    "q_top1_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
  SELECT o.*, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
  ) AS rn FROM orders o
) WHERE rn = 1
""",
)
def q_top1_per_group(spark: SparkSession, sf_dir: str):
    """J5/W2: deterministic top-1-per-key (``agency.py:146-151`` — "so
    that choice of stop is deterministic")."""
    return top1_per_group(
        load_table(spark, sf_dir, "orders"),
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    ).select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")


@fixture(
    "q_coalesce_fallback",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber,
       coalesce(p.p_name, s.s_name, 'unknown') AS resolved_name,
       CASE WHEN p.p_name IS NOT NULL THEN 'part'
            WHEN s.s_name IS NOT NULL THEN 'supplier'
            ELSE 'none' END AS resolved_from
FROM lineitem l
LEFT JOIN (SELECT p_partkey, p_name FROM part WHERE p_size > 25) p
  ON p.p_partkey = l.l_partkey
LEFT JOIN (SELECT s_suppkey, s_name FROM supplier WHERE s_acctbal > 0) s
  ON s.s_suppkey = l.l_suppkey
""",
)
def q_coalesce_fallback(spark: SparkSession, sf_dir: str):
    """J6: two-level fallback lookup + coalesce (``route.py:177-194``)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") > 25)
    sup = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 0)
    out = (
        li.join(
            F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"), "p_name")),
            "l_partkey",
            "left_outer",
        )
        .join(
            F.broadcast(sup.select(F.col("s_suppkey").alias("l_suppkey"), "s_name")),
            "l_suppkey",
            "left_outer",
        )
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.col("p_name"), F.col("s_name"), F.lit("unknown")).alias(
            "resolved_name"
        ),
        F.when(F.col("p_name").isNotNull(), F.lit("part"))
        .when(F.col("s_name").isNotNull(), F.lit("supplier"))
        .otherwise(F.lit("none"))
        .alias("resolved_from"),
    )


# ---------------------------------------------------------------------------
# §2.6 aggregation / dedup, §2.7 windows, §2.8 set ops
# ---------------------------------------------------------------------------

@fixture(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str):
    """A3: set-based dedup (``route.py:74-77``)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@fixture(
    "q_first_per_group",
    oracle="""
SELECT o_custkey, min(o_orderkey) AS first_orderkey,
       min_by(o_orderstatus, o_orderkey) AS first_status
FROM orders GROUP BY o_custkey
""",
)
def q_first_per_group(spark: SparkSession, sf_dir: str):
    """A4: dict-collapse made deterministic (``agency.py:259-264`` TODO)
    via min_by — partial-aggregatable, unlike a window."""
    df = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "first_orderkey"
    )
    out = first_per_group(
        df, ["o_custkey"], "first_orderkey", ["o_orderstatus"]
    )
    return out.select(
        "o_custkey",
        "first_orderkey",
        F.col("o_orderstatus").alias("first_status"),
    )


@fixture(
    "q_row_number",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(row_number() OVER (
         PARTITION BY l_orderkey ORDER BY l_linenumber
       ) AS INTEGER) AS rn
FROM lineitem
""",
)
def q_row_number(spark: SparkSession, sf_dir: str):
    """A5/W1: per-partition sequence numbering (``route.py:124-128``)."""
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.row_number().over(w).alias("rn")
    )


@fixture(
    "q_union_all",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment FROM customer
UNION ALL
SELECT CAST(-1 AS BIGINT), 'SENTINEL', 'NONE'
""",
)
def q_union_all(spark: SparkSession, sf_dir: str):
    """U1/U3: batch concat + sentinel row append (``route.py:35-37``)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    sentinel = spark.createDataFrame(
        [(-1, "SENTINEL", "NONE")], schema=cust.schema
    )
    return cust.unionByName(sentinel)


@fixture(
    "q_except",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
EXCEPT ALL
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey = 0
""",
)
def q_except(spark: SparkSession, sf_dir: str):
    """U2: set difference (``route.py:76-78``)."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.exceptAll(nation.where(F.col("n_regionkey") == 0))


# ---------------------------------------------------------------------------
# §2.9 scalar functions
# ---------------------------------------------------------------------------

@fixture(
    "q_epoch_to_ts",
    oracle="""
SELECT event_id,
       CAST(round(epoch_us(ts) / 1000000.0) AS BIGINT) AS epoch_sec,
       make_timestamp(CAST(round(epoch_us(ts) / 1000000.0) AS BIGINT) * 1000000) AS ts_rounded
FROM events
""",
)
def q_epoch_to_ts(spark: SparkSession, sf_dir: str):
    """X1: epoch-ms → timestamp with ROUND-not-truncate
    (``route.py:165-167``)."""
    ev = load_table(spark, sf_dir, "events")
    secs = F.round(F.col("ts_us") / F.lit(1000000.0), 0).cast("long")
    return ev.select(
        "event_id",
        secs.alias("epoch_sec"),
        F.timestamp_seconds(secs).cast("timestamp_ntz").alias("ts_rounded"),
    )


@fixture(
    "q_tz_date",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate - INTERVAL 5 HOUR AS DATE) AS local_date
FROM orders
""",
)
def q_tz_date(spark: SparkSession, sf_dir: str):
    """X4: UTC → local-date rollover detection (``run.py:103-111``).
    Fixed −05:00 offset in the fixture (zone-db-free for the oracle);
    ``functions.utc_to_local_date`` does real zone conversion."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date(F.col("o_orderdate") - F.expr("INTERVAL 5 HOURS")).alias(
            "local_date"
        ),
    )


@fixture(
    "q_cast_double",
    oracle="""
SELECT p_partkey, CAST(p_size AS DOUBLE) AS size_d,
       CAST(CAST(p_size AS VARCHAR) AS DOUBLE) AS size_str_d
FROM part
""",
)
def q_cast_double(spark: SparkSession, sf_dir: str):
    """X6: string→double cast (``route.py:202``, ``run.py:62``)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size_d"),
        F.col("p_size").cast("string").cast("double").alias("size_str_d"),
    )


# ---------------------------------------------------------------------------
# Standard aggregate / window surface (SURVEY.md §2.6 note: shipped
# because the harness exercises TPC-H-style fixtures)
# ---------------------------------------------------------------------------

@fixture(
    "q_tpch_q1",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str):
    """TPC-H Q1 pricing summary — the headline batch aggregate: one
    scan, map-side partial agg, tiny shuffle (few groups)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@fixture(
    "q_agg_stats",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n,
       count(DISTINCT c_nationkey) AS n_nations,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       round(avg(c_acctbal), 4) AS avg_bal,
       round(sum(c_acctbal), 2) AS sum_bal
FROM customer GROUP BY c_mktsegment
""",
)
def q_agg_stats(spark: SparkSession, sf_dir: str):
    """Standard aggregate surface: count / count-distinct / min / max /
    avg / sum per group."""
    return load_table(spark, sf_dir, "customer").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col("c_nationkey")).alias("n_nations"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


@fixture(
    "q_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def q_rollup(spark: SparkSession, sf_dir: str):
    """Grouping-sets surface: ROLLUP with subtotal rows (NULL markers)."""
    return load_table(spark, sf_dir, "orders").rollup(
        "o_orderstatus", "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@fixture(
    "q_window_running",
    oracle="""
SELECT user_id, event_id,
       CAST(count(*) OVER w AS BIGINT) AS running_n,
       round(sum(value) OVER w, 2) AS running_value,
       round(lag(value) OVER w, 2) AS prev_value
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
)
""",
)
def q_window_running(spark: SparkSession, sf_dir: str):
    """Analytic windows: running count/sum + lag, deterministic order
    (ts, event_id). Sequential in-partition fold ⇒ engine-stable FP."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("running_n"),
        F.round(F.sum("value").over(w), 2).alias("running_value"),
        F.round(F.lag("value").over(wl), 2).alias("prev_value"),
    )


@fixture(
    "q_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                   THEN 1 ELSE 0 END AS is_new
  FROM events
)
SELECT user_id, event_id,
       CAST(sum(is_new) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS session_idx
FROM flagged
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str):
    """Sessionization: 30-min-gap session ids via lag + running sum —
    the batch analogue of a session window (SURVEY.md §2.10 notes the
    reference has none; this is the extension surface)."""
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts_us") - F.lag("ts_us").over(wo)
    is_new = F.when(
        F.lag("ts_us").over(wo).isNull() | (gap > 1_800_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("is_new", is_new)
        .select(
            "user_id",
            "event_id",
            F.sum("is_new").over(wr).alias("session_idx"),
        )
    )


@fixture(
    "q_asof_join",
    oracle="""
SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST
         ) AS rn
  FROM events e LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str):
    """As-of join (extension): latest order at-or-before each event per
    user. Equi-join + ``max_by`` aggregation — the candidate explosion
    collapses map-side (partial agg) instead of shuffling into a window
    sort. See operators/asof.py for the library form and the
    time-bucketed 100 TB path."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    cond = (orders["o_custkey"] == ev["user_id"]) & (
        orders["o_orderdate"] <= ev["ts"]
    )
    joined = ev.join(orders, cond, "left")
    # max_by ignores NULL ordering values, so unmatched events keep a
    # NULL match — identical to the rn=1 NULLS LAST window pick.
    return joined.groupBy("event_id", "user_id").agg(
        F.max_by(
            F.struct("o_orderkey", "o_orderdate"),
            F.struct("o_orderdate", "o_orderkey"),
        ).alias("m"),
    ).select(
        "event_id",
        "user_id",
        F.col("m.o_orderkey").alias("o_orderkey"),
        F.col("m.o_orderdate").alias("o_orderdate"),
    )


@fixture(
    "q_asof_bucketed",
    oracle="""
WITH l AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
  WHERE event_type = 'view'
),
r AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS r_ts_us,
         value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, user_id, purchase_id, purchase_value FROM (
  SELECT l.event_id, l.user_id, r.purchase_id, r.purchase_value,
         row_number() OVER (
           PARTITION BY l.event_id
           ORDER BY r.r_ts_us DESC NULLS LAST,
                    r.purchase_id DESC NULLS LAST
         ) AS rn
  FROM l LEFT JOIN r
    ON r.user_id = l.user_id AND r.r_ts_us <= l.ts_us
   AND l.ts_us // 86400000000 - r.r_ts_us // 86400000000 BETWEEN 0 AND 3
) WHERE rn = 1
""",
)
def q_asof_bucketed(spark: SparkSession, sf_dir: str):
    """Big-big as-of join with bounded lookback (the 100 TB as-of
    path): last purchase at-or-before each view per user, looking back
    at most 3 day-buckets. The right side replicates into its
    visibility buckets so the range join becomes an equi-join on
    (user, bucket) — candidate fan-out is bounded by construction and
    neither side is ever broadcast. Winner via max_by aggregation."""
    from nextbus2pg_spark.operators.asof import asof_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
        "ts_us",
    )
    out = asof_join_bucketed(
        views,
        purchases,
        left_id="event_id",
        on="user_id",
        left_ts="ts_us",
        right_ts="ts_us",
        right_cols=["purchase_id", "purchase_value"],
        bucket_width=86_400_000_000,
        lookback=3,
        tiebreak="purchase_id",
    )
    return out.select("event_id", "user_id", "purchase_id", "purchase_value")


# ---------------------------------------------------------------------------
# Flagship (entry() + bench headline): the reference's hot path as one
# batch query — SURVEY.md §7 milestone 0.
# ---------------------------------------------------------------------------

@fixture(
    "q_flagship_latest",
    oracle="""
WITH dedup AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (
      PARTITION BY user_id, event_type, ts ORDER BY event_id
    ) AS dd FROM events e
  ) WHERE dd = 1
),
ranked AS (
  SELECT user_id, event_type, ts, event_id, value,
         row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
         ) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type) AS n_events
  FROM dedup
)
SELECT r.user_id, r.event_type, c.c_name, c.c_mktsegment,
       r.ts AS last_ts, round(r.value, 2) AS last_value,
       CAST(r.n_events AS BIGINT) AS n_events
FROM ranked r JOIN customer c ON c.c_custkey = r.user_id
WHERE rn = 1
""",
)
def q_flagship_latest(spark: SparkSession, sf_dir: str):
    """Flagship: latest position per vehicle per service, enriched with
    dims — scan → event-time → dedup (A2) → broadcast dim join (J2) →
    deterministic top-1 (J5/W2), the shape of ``agency.py:239-324``.
    """
    ev = load_table(spark, sf_dir, "events")
    # A2 dedup at the event grain with deterministic survivor (min
    # event_id) — as an aggregation, not a window: partial (map-side)
    # aggregation shrinks the shuffle, and no in-partition sort happens.
    dedup = ev.groupBy("user_id", "event_type", "ts_us").agg(
        F.min_by(F.col("value"), F.col("event_id")).alias("value"),
    )
    # Top-1 latest + group count in ONE more aggregation (max_by on the
    # grouped grain replaces the rank window; ts_us is unique per group
    # after dedup, so the window's event_id tiebreak is vacuous).
    latest = dedup.groupBy("user_id", "event_type").agg(
        F.max_by(F.struct("ts_us", "value"), F.col("ts_us")).alias("last"),
        F.count(F.lit(1)).alias("n_events"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    return broadcast_lookup(latest, cust, "user_id").select(
        "user_id",
        "event_type",
        "c_name",
        "c_mktsegment",
        F.timestamp_micros(F.col("last.ts_us")).cast("timestamp_ntz").alias("last_ts"),
        F.round(F.col("last.value"), 2).alias("last_value"),
        "n_events",
    )


@fixture(
    "q_xml_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str):
    """Executor-side XML parse (§2.11: ``from_xml``, the path the feed
    source rides — ``sources/feed.py:78-137``) as a hash-checked
    round-trip: render each row as an XML document string, parse it
    back with ``from_xml`` on executors, and return the extracted
    attributes — which must equal the original relation (the oracle is
    the identity SELECT). TPC-H nation names are XML-safe (uppercase
    letters and spaces only), so no escaping is exercised here."""
    n = load_table(spark, sf_dir, "nation")
    xml = n.select(
        F.format_string(
            '<row key="%s" name="%s" region="%s"/>',
            F.col("n_nationkey"), F.col("n_name"), F.col("n_regionkey"),
        ).alias("payload")
    )
    parsed = xml.withColumn(
        "doc",
        F.from_xml(
            "payload",
            F.lit("STRUCT<_key: BIGINT, _name: STRING, _region: BIGINT>"),
        ),
    )
    return parsed.select(
        F.col("doc._key").alias("n_nationkey"),
        F.col("doc._name").alias("n_name"),
        F.col("doc._region").alias("n_regionkey"),
    )
