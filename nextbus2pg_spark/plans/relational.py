"""Additional relational-surface fixture queries: TPC-H Q6/Q12/Q14/Q18
shapes, EXISTS / NOT EXISTS, grouping sets, value-range window frames,
unpivot, regex extraction, and conditional-expression coverage.

The reference computes none of these (SURVEY.md §2.6 note — its only
aggregation-shaped ops are dedup and grouped-top-1), but the engine
ships the standard analytic surface; every query here is DuckDB
oracle-checked like the core set. Shapes follow public TPC-H queries
adapted to the driver's fixture schema (lineitem has no
shipmode/commitdate/receiptdate columns, so Q12's bucketing runs on
o_orderpriority instead).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.plans.registry import fixture


@fixture(
    "q_tpch_q6",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str):
    """TPC-H Q6 forecasting-revenue shape: pure scan + conjunctive
    filter + global sum. The whole predicate reaches the parquet scan
    (PushedFilters on l_shipdate/l_discount/l_quantity) and only four
    columns are read — the canonical pushdown/pruning showcase."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@fixture(
    "q_tpch_q12",
    oracle="""
SELECT l_linestatus,
       CAST(count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS BIGINT) AS high_line_count,
       CAST(count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str):
    """TPC-H Q12 shape (priority-bucketed conditional counts over a
    fact join; bucketing on o_orderpriority since the fixture lineitem
    has no l_shipmode). Conditional counts compile to one partial
    aggregate — no second pass per bucket."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
    )


@fixture(
    "q_tpch_q14",
    oracle="""
SELECT round(
         100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0.0 END)
         / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
""",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str):
    """TPC-H Q14 promotion-effect shape: one month of lineitem joined
    to part (broadcast — part is a dimension), promo share via
    conditional sum in the same aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue")
        )
    )


@fixture(
    "q_tpch_q18",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS totalprice,
       round(qty, 2) AS qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
) big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str):
    """TPC-H Q18 large-volume-customer shape: pre-aggregate the fact to
    order grain FIRST (map-side partial agg shrinks the shuffle to one
    row per order), filter HAVING, then join the small survivor set to
    orders/customer. At 100 TB the pre-agg-then-join ordering is the
    difference between shuffling the fact once at order grain vs
    joining the full fact."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(F.desc(F.round(F.col("o_totalprice"), 2)), F.asc("o_orderkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.round(F.col("qty"), 2).alias("qty"),
        )
    )


@fixture(
    "q_exists_subquery",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 400000)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F'
                    AND o.o_totalprice < 1000)
""",
)
def q_exists_subquery(spark: SparkSession, sf_dir: str):
    """Correlated EXISTS / NOT EXISTS: planned as a left-semi and a
    left-anti join — both shuffle only on the correlation key and keep
    the subquery side pre-filtered (SURVEY.md §2.5 J7/J3 generalized)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    has_big = orders.where(F.col("o_totalprice") > 400000).select("o_custkey")
    has_small_f = orders.where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 1000)
    ).select("o_custkey")
    return (
        cust.join(has_big, cust.c_custkey == has_big.o_custkey, "left_semi")
        .join(has_small_f, cust.c_custkey == has_small_f.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@fixture(
    "q_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str):
    """Explicit GROUPING SETS (distinct from the cube/rollup fixtures)
    with grouping() markers disambiguating NULL-as-total from
    NULL-as-value. One shuffle computes all three set shapes."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "n",
            "total",
            "g_status",
            "g_priority",
        )
    )


@fixture(
    "q_window_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(count(*) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_orders_90d,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
       ), 2) AS spend_90d
FROM orders
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str):
    """Value-range window frame: trailing-90-day order count and spend
    per customer. RANGE frames bound by the ORDER BY *value* (epoch
    seconds; 90 d = 7 776 000 s) — unlike the ROWS frames in
    q_window_running — and need no self-join: one sort per partition."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7776000, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.count(F.lit(1)).over(w).alias("n_orders_90d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_90d"),
    )


@fixture(
    "q_unpivot",
    oracle="""
SELECT c_custkey, metric, round(value, 2) AS value
FROM (
  SELECT c_custkey,
         CAST(c_nationkey AS DOUBLE) AS nationkey,
         c_acctbal AS acctbal
  FROM customer
) UNPIVOT (value FOR metric IN (nationkey, acctbal))
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str):
    """Unpivot (wide → long): Spark's unpivot() / SQL stack(). Narrow
    transform — no shuffle at all; stays inside the scan's partitions."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            "c_custkey",
            F.col("c_nationkey").cast("double").alias("nationkey"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .unpivot("c_custkey", ["nationkey", "acctbal"], "metric", "value")
        .select("c_custkey", "metric", F.round("value", 2).alias("value"))
    )


@fixture(
    "q_regexp_extract",
    oracle="""
SELECT doc_id,
       regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
       CAST(length(regexp_replace(text, '[^0-9]+', '', 'g')) AS INTEGER)
         AS n_digits,
       CAST(regexp_matches(text, '[0-9]') AS BOOLEAN) AS has_digit
FROM documents
""",
)
def q_regexp_extract(spark: SparkSession, sf_dir: str):
    """Regex surface: extract / replace / match — all JVM-side codegen
    expressions (no UDF). DuckDB's regexp_replace needs the 'g' flag to
    match Spark's replace-all semantics."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.length(F.regexp_replace("text", r"[^0-9]+", "")).alias("n_digits"),
        F.col("text").rlike("[0-9]").alias("has_digit"),
    )


@fixture(
    "q_tumbling_window",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP)
         AS window_end,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2, 3
""",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str):
    """Tumbling event-time window rollup — the batch form of the
    streaming ``windowed_activity`` (streaming/windows.py). The window
    expression is an ordinary grouping column: one shuffle on
    (window, event_type) after map-side partial aggregation. The
    streaming variant swaps count_distinct for approx_count_distinct
    (exact distinct is holistic; the sketch is mergeable) — here the
    exact form keeps the query oracle-checkable."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
        )
    )


@fixture(
    "q_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                   THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS sid
  FROM flagged
)
SELECT CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
       user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM sess GROUP BY user_id, sid
""",
)
def q_session_window(spark: SparkSession, sf_dir: str):
    """Native ``session_window`` aggregation (30-min gap): Spark fuses
    per-key session assignment INTO the aggregation — one shuffle on
    (user, session), no lag/running-sum window pass (the expression
    form q_sessionize uses). A new session starts when the gap to the
    previous event is >= the timeout (session end = last event + gap,
    end-exclusive); the oracle replays exactly that rule with
    lag + running sum. Streaming gets the same operator with
    watermark-based state eviction (streaming/windows.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


@fixture(
    "q_sliding_window",
    oracle="""
WITH half AS (
  SELECT CAST(time_bucket(INTERVAL 30 MINUTE, ts) AS TIMESTAMP) AS t30,
         event_type, value
  FROM events
),
expanded AS (
  SELECT t30 AS window_start, event_type, value FROM half
  UNION ALL
  SELECT t30 - INTERVAL 30 MINUTE AS window_start, event_type, value
  FROM half
)
SELECT window_start,
       CAST(window_start + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM expanded GROUP BY 1, 2, 3
""",
)
def q_sliding_window(spark: SparkSession, sf_dir: str):
    """Sliding (hopping) event-time window: 1-hour windows every 30
    minutes, so each event lands in exactly width/slide = 2 windows.
    Spark's ``window(ts, width, slide)`` is a generator expression — the
    ×2 replication happens map-side before the partial aggregation, so
    the shuffle carries partial aggregates of the replicated rows, never
    the raw ×2 rows. The oracle makes the same expansion explicit (two
    shifted 30-minute buckets unioned)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@fixture(
    "q_label_centroids",
    oracle="""
SELECT label, CAST(i - 1 AS INTEGER) AS pos, round(avg(e), 5) AS centroid
FROM (
  SELECT label, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS e
  FROM embeddings
)
GROUP BY label, i
""",
)
def q_label_centroids(spark: SparkSession, sf_dir: str):
    """Per-label centroid of the embedding vectors (the training step
    of the IVF index in operators/similarity.py), long-form
    (label, pos, centroid). posexplode turns the array into rows
    map-side; the single shuffle carries (label, pos) partial sums —
    dims × labels rows, independent of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        .groupBy("label", "pos")
        .agg(F.round(F.avg("col"), 5).alias("centroid"))
    )


@fixture(
    "q_range_join",
    oracle="""
SELECT o_custkey AS user_id,
       CAST(count(*) AS BIGINT) AS n_events_in_window
FROM orders JOIN events
  ON user_id = o_custkey
 AND ts >= o_orderdate
 AND ts < o_orderdate + INTERVAL 30 DAY
GROUP BY o_custkey
""",
)
def q_range_join(spark: SparkSession, sf_dir: str):
    """Range join (equi key + interval band): events within 30 days
    after each order by the same user. The equi key carries the join
    (hash/broadcast — the band is a post-join filter, NOT a cross
    product); count rolls up per user. SURVEY.md §2.5 notes the
    reference has no range joins — extension surface."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(
            ev,
            (ev.user_id == orders.o_custkey)
            & (ev.ts >= orders.o_orderdate)
            & (ev.ts < F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events_in_window"))
    )


@fixture(
    "q_salted_agg",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY l_returnflag
""",
)
def q_salted_agg(spark: SparkSession, sf_dir: str):
    """Two-phase skew-resistant aggregation (operators/scale.py::
    salted_agg): phase 1 aggregates by (key, salt) spreading each hot
    key over 8 partial groups, phase 2 combines by key — identical
    results to the plain groupBy (that's what the oracle asserts),
    with the hot key's work parallelized 8x. l_returnflag has ~3
    values over 600k rows at sf0.1: exactly the pathological
    low-cardinality shape AQE's skew handling does not cover for
    aggregations."""
    from nextbus2pg_spark.operators.scale import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {"n": "count(1)", "sum_qty": "sum(l_quantity)"},
        factor=8,
    )
    return out.select(
        "l_returnflag", "n", F.round("sum_qty", 2).alias("sum_qty")
    )


@fixture(
    "q_tpch_q19",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str):
    """TPC-H Q19 discounted-revenue shape: disjunctive multi-table
    predicate over a broadcast join. Catalyst extracts the common
    join key so the OR branches stay post-join filters (no cross
    product), and pushes the per-table conjuncts it can derive
    (l_quantity range, p_size range) below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    def branch(brand, size_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
    return j.where(
        branch("Brand#1", 15, 1, 11)
        | branch("Brand#2", 25, 10, 20)
        | branch("Brand#3", 35, 20, 30)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@fixture(
    "q_profile",
    oracle="""
SELECT 'o_orderkey' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(min(o_orderkey) AS DOUBLE) AS min_num,
       CAST(max(o_orderkey) AS DOUBLE) AS max_num
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       NULL, NULL
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT),
       CAST(count(DISTINCT o_totalprice) AS BIGINT),
       CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE)
FROM orders
""",
)
def q_profile(spark: SparkSession, sf_dir: str):
    """Per-column data profile (operators/quality.py::profile): null
    counts, exact distincts, numeric min/max for three orders columns —
    ONE scan and one wide agg regardless of column count (the oracle's
    UNION ALL form scans once per column; the engine's form doesn't)."""
    from nextbus2pg_spark.operators.quality import profile

    orders = load_table(spark, sf_dir, "orders")
    return profile(orders, ["o_orderkey", "o_orderstatus", "o_totalprice"])


@fixture(
    "q_conditional_funcs",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       nullif(o_orderstatus, 'O') AS status_or_null,
       ifnull(nullif(o_orderstatus, 'O'), 'open') AS status_label,
       round(least(o_totalprice, 250000.0), 2) AS capped,
       round(greatest(o_totalprice, 50000.0), 2) AS floored
FROM orders
""",
)
def q_conditional_funcs(spark: SparkSession, sf_dir: str):
    """Conditional-expression surface: CASE WHEN, nullif, ifnull,
    least/greatest — pure row-local codegen expressions."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.ifnull(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")
        ).alias("status_label"),
        F.round(F.least(F.col("o_totalprice"), F.lit(250000.0)), 2).alias("capped"),
        F.round(F.greatest(F.col("o_totalprice"), F.lit(50000.0)), 2).alias(
            "floored"
        ),
    )


@fixture(
    "q_interval_join",
    oracle="""
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       v.ts AS view_ts,
       p.ts AS purchase_ts
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') v
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 6 HOUR
""",
)
def q_interval_join(spark: SparkSession, sf_dir: str):
    """Event-time interval join (streaming/joins.py::interval_join run
    in batch mode — the IDENTICAL plan watermark-bounds state on two
    live streams): every view matched to same-user purchases within
    the following 6 hours, the classic attribution join. Equi key
    carries the join; the two-sided time band is evaluated inside the
    join operator, never a cartesian."""
    from nextbus2pg_spark.streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return interval_join(
        views,
        purchases,
        "user_id",
        "view_ts",
        "purchase_ts",
        lower="0 seconds",
        upper="6 hours",
    ).select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")


@fixture(
    "q_grouped_corr",
    oracle="""
WITH q AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 1) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
a AS (
  SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM q GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS corr,
       CASE WHEN n * sxx - sx * sx > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS slope
FROM a
""",
)
def q_grouped_corr(spark: SparkSession, sf_dir: str):
    """Per-returnflag Pearson correlation + OLS slope of extended
    price (cents) on quantity (operators/stats.grouped_pearson):
    inputs quantize to exact integers, the five moment sums
    accumulate as DECIMAL(38,0) (= DuckDB HUGEINT — order-independent
    and exact), and the statistic is ONE fixed double expression at
    the end. Zero-variance groups resolve by integer comparison."""
    from nextbus2pg_spark.operators.stats import grouped_pearson

    li = load_table(spark, sf_dir, "lineitem")
    return grouped_pearson(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice",
        x_scale=1, y_scale=100,
    )


@fixture(
    "q_chi_squared",
    oracle="""
WITH base AS (
  SELECT lang AS a, source AS b FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
),
obs AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS obs FROM base GROUP BY a, b
),
cells AS (
  SELECT g.a, g.b, COALESCE(o.obs, 0) AS o
  FROM (SELECT ra.a, cb.b
        FROM (SELECT DISTINCT a FROM obs) ra,
             (SELECT DISTINCT b FROM obs) cb) g
  LEFT JOIN obs o ON o.a = g.a AND o.b = g.b
),
rt AS (SELECT a, sum(o) AS ra FROM cells GROUP BY a),
ct AS (SELECT b, sum(o) AS cb FROM cells GROUP BY b),
tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n,
         count(DISTINCT a) AS nr, count(DISTINCT b) AS nc
  FROM cells
),
terms AS (
  SELECT c.a, c.b,
         (CAST(c.o AS DOUBLE)
          - CAST(r.ra AS DOUBLE) * CAST(t.cb AS DOUBLE)
            / CAST(x.n AS DOUBLE))
         * (CAST(c.o AS DOUBLE)
            - CAST(r.ra AS DOUBLE) * CAST(t.cb AS DOUBLE)
              / CAST(x.n AS DOUBLE))
         / (CAST(r.ra AS DOUBLE) * CAST(t.cb AS DOUBLE)
            / CAST(x.n AS DOUBLE)) AS trm,
         x.n, x.nr, x.nc
  FROM cells c JOIN rt r USING (a) JOIN ct t USING (b) CROSS JOIN tot x
)
SELECT list_reduce(list_transform(
         list(struct_pack(k := struct_pack(a := a, b := b), v := trm)
              ORDER BY a, b),
         s -> s.v), (p, q) -> p + q) AS chi2,
       CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
       n
FROM terms
GROUP BY n, nr, nc
""",
)
def q_chi_squared(spark: SparkSession, sf_dir: str):
    """Chi-squared independence test of document language vs source
    (operators/stats.chi_squared): exact integer contingency table,
    fixed-expression expected counts, and a cell-sorted fold for the
    total — the oracle replays every double bit-for-bit."""
    from nextbus2pg_spark.operators.stats import chi_squared

    docs = load_table(spark, sf_dir, "documents")
    return chi_squared(docs, "lang", "source")


@fixture(
    "q_mad_outliers",
    oracle="""
WITH src AS (
  SELECT event_type, event_id, value,
         CAST(round(value * 100) AS BIGINT) AS vq
  FROM events
),
base AS (SELECT * FROM src WHERE vq IS NOT NULL),
med AS (
  SELECT event_type, CAST(2 * median(vq) AS BIGINT) AS m2
  FROM base GROUP BY event_type
),
d AS (
  SELECT b.event_type, abs(2 * b.vq - m.m2) AS d2
  FROM base b JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, CAST(2 * median(d2) AS BIGINT) AS m4
  FROM d GROUP BY event_type
)
SELECT s.event_type, s.event_id, s.value,
       CAST(m.m2 AS DOUBLE) / 200.0 AS med,
       CAST(a.m4 AS DOUBLE) / 400.0 AS mad,
       CASE WHEN s.vq IS NOT NULL AND a.m4 > 0
            THEN CAST(2 * abs(2 * s.vq - m.m2) AS DOUBLE)
                 / CAST(a.m4 AS DOUBLE)
       END AS mad_ratio,
       COALESCE(s.vq IS NOT NULL AND a.m4 > 0
                AND 2 * abs(2 * s.vq - m.m2) > 3 * a.m4,
                FALSE) AS is_outlier
FROM src s LEFT JOIN med m USING (event_type)
           LEFT JOIN mad a USING (event_type)
""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str):
    """Median/MAD robust outlier screen per event type
    (operators/stats.mad_outliers, k=3): values quantize to cents,
    both medians are exact interpolated medians over integers (always
    a multiple of 0.5 — identical on any engine), and the flag is the
    pure integer comparison 2*d2 > k*m4. The z-score screen this
    replaces is dragged by the very outliers it hunts; median/MAD has
    a 50% breakdown point."""
    from nextbus2pg_spark.operators.stats import mad_outliers

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    return mad_outliers(ev, ["event_type"], "value", scale=100, k=3)


@fixture(
    "q_ks_drift",
    oracle="""
WITH base AS (
  SELECT CASE WHEN day(ts) <= 15 THEN 'w1' ELSE 'w2' END AS s,
         CAST(round(value * 100) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL
),
pv AS (
  SELECT vq,
         sum(CASE WHEN s = 'w1' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN s = 'w2' THEN 1 ELSE 0 END) AS cb
  FROM base GROUP BY vq
),
cum AS (
  SELECT vq,
         sum(ca) OVER (ORDER BY vq
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cca,
         sum(cb) OVER (ORDER BY vq
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccb
  FROM pv
),
tot AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM pv),
g AS (
  SELECT c.vq, abs(c.cca * t.n_b - c.ccb * t.n_a) AS d, t.n_a, t.n_b
  FROM cum c CROSS JOIN tot t
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(max(d) AS BIGINT) AS d_num,
       CAST(max(d) AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS ks,
       CAST((SELECT min(vq) FROM g g2
             WHERE g2.d = (SELECT max(d) FROM g)) AS DOUBLE) / 100.0
         AS at_value
FROM g GROUP BY n_a, n_b
""",
)
def q_ks_drift(spark: SparkSession, sf_dir: str):
    """Two-sample Kolmogorov-Smirnov drift test
    (operators/stats.ks_statistic): the event-value distribution of
    the month's first half vs its second half. ECDF gaps are
    cross-multiplied exact integers (|c_a*n_b - c_b*n_a| in
    DECIMAL/HUGEINT), max and argmax are integer decisions with a
    min-value tie-break, and ks is one final division."""
    from nextbus2pg_spark.operators.stats import ks_statistic

    ev = load_table(spark, sf_dir, "events").withColumn(
        "half",
        F.when(F.dayofmonth("ts") <= 15, F.lit("w1")).otherwise(
            F.lit("w2")
        ),
    )
    return ks_statistic(ev, "half", "value", "w1", "w2", scale=100)


@fixture(
    "q_fuzzy_join",
    oracle="""
WITH s AS (
  SELECT CAST(s_suppkey AS BIGINT) AS id, lower(s_name) AS t
  FROM supplier WHERE s_name IS NOT NULL
)
SELECT a.id AS left_id, b.id AS right_id,
       CAST(levenshtein(a.t, b.t) AS INTEGER) AS dist
FROM s a JOIN s b ON a.id < b.id
WHERE levenshtein(a.t, b.t) <= 1
""",
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str):
    """Fuzzy self-linkage of supplier names at edit distance <= 1
    (operators/linkage.fuzzy_join): deletion-neighborhood blocking
    (FastSS — provably exact recall at the threshold) generates
    candidates as an equi-join on variant strings, one levenshtein per
    CANDIDATE verifies. The oracle computes the naive all-pairs
    DEFINITION, proving the blocking misses nothing — the
    setsim_join oracle recipe. Supplier names differ in digit
    substitutions, the classic near-identical-identifier linkage."""
    from nextbus2pg_spark.operators.linkage import fuzzy_join

    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    out = fuzzy_join(
        sup, sup, "s_suppkey", "s_suppkey", "s_name", "s_name",
        max_dist=1,
    )
    return out.where(F.col("left_id") < F.col("right_id")).select(
        F.col("left_id").cast("long").alias("left_id"),
        F.col("right_id").cast("long").alias("right_id"),
        "dist",
    )


def _drift_profile_sql(half: str) -> str:
    """One snapshot's 2-column profile (event_type, value) as the
    oracle's UNION ALL form over the given half-month predicate."""
    pred = (
        "day(ts) <= 15" if half == "a" else "day(ts) > 15"
    )
    return f"""
SELECT 'event_type' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE event_type IS NULL) AS BIGINT)
         AS n_nulls,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num
FROM events WHERE {pred}
UNION ALL
SELECT 'value', CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT),
       CAST(count(DISTINCT value) AS BIGINT),
       CAST(min(value) AS DOUBLE), CAST(max(value) AS DOUBLE)
FROM events WHERE {pred}"""


@fixture(
    "q_profile_drift",
    oracle=f"""
WITH pa AS ({_drift_profile_sql('a')}),
pb AS ({_drift_profile_sql('b')})
SELECT pa."column",
       pa.n_rows AS n_rows_a, pb.n_rows AS n_rows_b,
       pa.n_nulls AS n_nulls_a, pb.n_nulls AS n_nulls_b,
       CAST(pa.n_nulls AS DOUBLE) / CAST(pa.n_rows AS DOUBLE)
         AS null_rate_a,
       CAST(pb.n_nulls AS DOUBLE) / CAST(pb.n_rows AS DOUBLE)
         AS null_rate_b,
       CAST(pb.n_nulls AS DOUBLE) / CAST(pb.n_rows AS DOUBLE)
         - CAST(pa.n_nulls AS DOUBLE) / CAST(pa.n_rows AS DOUBLE)
         AS null_rate_delta,
       pa.n_distinct AS n_distinct_a, pb.n_distinct AS n_distinct_b,
       pa.min_num AS min_a, pb.min_num AS min_b,
       pa.max_num AS max_a, pb.max_num AS max_b
FROM pa JOIN pb ON pb."column" = pa."column"
""",
)
def q_profile_drift(spark: SparkSession, sf_dir: str):
    """Snapshot-to-snapshot column drift
    (operators/quality.profile_drift): the month's first half vs its
    second half of the event log, per column — null rates (exact
    divisions), exact distinct counts, numeric range shifts. The
    cheap always-on tripwire in front of the value-level drift tests
    (q_ks_drift, q_chi_squared); one profile pass per side, a
    column-name-sized join."""
    from nextbus2pg_spark.operators.quality import profile_drift

    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.dayofmonth("ts") <= 15)
    b = ev.where(F.dayofmonth("ts") > 15)
    return profile_drift(a, b, ["event_type", "value"])


@fixture(
    "q_welch_t",
    oracle="""
WITH base AS (
  SELECT event_type AS s, CAST(round(value * 100) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL
),
agg AS (
  SELECT
    CAST(sum(CASE WHEN s = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT) AS na,
    CAST(sum(CASE WHEN s = 'view' THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
    sum(CASE WHEN s = 'purchase' THEN CAST(vq AS HUGEINT)
             ELSE CAST(0 AS HUGEINT) END) AS sa,
    sum(CASE WHEN s = 'view' THEN CAST(vq AS HUGEINT)
             ELSE CAST(0 AS HUGEINT) END) AS sb,
    sum(CASE WHEN s = 'purchase' THEN CAST(vq AS HUGEINT) * CAST(vq AS HUGEINT)
             ELSE CAST(0 AS HUGEINT) END) AS ssa,
    sum(CASE WHEN s = 'view' THEN CAST(vq AS HUGEINT) * CAST(vq AS HUGEINT)
             ELSE CAST(0 AS HUGEINT) END) AS ssb
  FROM base
),
x AS (
  SELECT na, nb, sa, sb,
         na * ssa - sa * sa AS va_num,
         nb * ssb - sb * sb AS vb_num,
         CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd
  FROM agg
),
y AS (
  SELECT na, nb, sa, sb, va_num, vb_num, nad, nbd,
         CAST(va_num AS DOUBLE) / (nad * (nad - 1.0) * nad) AS qa,
         CAST(vb_num AS DOUBLE) / (nbd * (nbd - 1.0) * nbd) AS qb,
         CAST(sa AS DOUBLE) / nad - CAST(sb AS DOUBLE) / nbd AS md
  FROM x
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(sa AS DOUBLE) / nad / 100.0 AS mean_a,
       CAST(sb AS DOUBLE) / nbd / 100.0 AS mean_b,
       CASE WHEN na >= 2 AND nb >= 2 AND (va_num > 0 OR vb_num > 0)
            THEN md / sqrt(qa + qb) END AS t_stat,
       CASE WHEN na >= 2 AND nb >= 2 AND (va_num > 0 OR vb_num > 0)
            THEN (qa + qb) * (qa + qb)
                 / (qa * qa / (nad - 1.0) + qb * qb / (nbd - 1.0))
       END AS dof
FROM y
""",
)
def q_welch_t(spark: SparkSession, sf_dir: str):
    """Welch's unequal-variance two-sample t between purchase and view
    event values (operators/stats.welch_t, cent quantization) — the
    A/B-testing primitive. One partial-aggregated pass accumulates
    both groups' exact DECIMAL(38,0)/HUGEINT moment sums; t and the
    Welch-Satterthwaite dof are fixed double expressions over them,
    replayed term-for-term by the oracle."""
    from nextbus2pg_spark.operators.stats import welch_t

    ev = load_table(spark, sf_dir, "events")
    return welch_t(ev, "event_type", "value", "purchase", "view",
                   scale=100)


@fixture(
    "q_rank_auc",
    oracle="""
WITH base AS (
  SELECT event_type AS s, CAST(round(value * 100) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL
),
pv AS (
  SELECT * FROM (
    SELECT vq,
      CAST(sum(CASE WHEN s = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT)
        AS cp,
      CAST(sum(CASE WHEN s = 'view' THEN 1 ELSE 0 END) AS HUGEINT)
        AS cn
    FROM base GROUP BY vq) g
  WHERE cp > 0 OR cn > 0
),
rk AS (
  SELECT cp, cn,
    2 * (sum(cp + cn) OVER (ORDER BY vq
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - (cp + cn)) + (cp + cn) + 1 AS r2,
    sum(cp) OVER () AS np, sum(cn) OVER () AS nn
  FROM pv
),
a AS (SELECT np, nn, sum(cp * r2) AS r2p FROM rk GROUP BY np, nn)
SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       CAST(r2p - np * (np + 1) AS DOUBLE) / 2.0 AS u_pos,
       CASE WHEN np > 0 AND nn > 0
            THEN CAST(r2p - np * (np + 1) AS DOUBLE)
                 / (2.0 * CAST(np * nn AS DOUBLE))
       END AS auc
FROM a
""",
)
def q_rank_auc(spark: SparkSession, sf_dir: str):
    """Exact ROC-AUC of the event value as a purchase-vs-view ranking
    signal (operators/stats.mann_whitney_auc, cent quantization):
    tie-aware Mann-Whitney U from doubled midrank sums — exact
    integers end to end, one subtraction and one division at the
    close. The distinct-value collapse bounds the sequential piece
    exactly as in q_ks_drift."""
    from nextbus2pg_spark.operators.stats import mann_whitney_auc

    ev = load_table(spark, sf_dir, "events")
    return mann_whitney_auc(
        ev, "event_type", "value", "purchase", "view", scale=100
    )


@fixture(
    "q_spearman",
    oracle="""
WITH base AS (
  SELECT CAST(round(l_quantity * 1) AS BIGINT) AS xq,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS yq
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
rxv AS (
  SELECT xq,
         2 * (sum(c) OVER (ORDER BY xq
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
           + c + 1 AS rx
  FROM (SELECT xq, CAST(count(*) AS HUGEINT) AS c FROM base GROUP BY xq) t
),
ryv AS (
  SELECT yq,
         2 * (sum(c) OVER (ORDER BY yq
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
           + c + 1 AS ry
  FROM (SELECT yq, CAST(count(*) AS HUGEINT) AS c FROM base GROUP BY yq) t
),
rk AS (
  SELECT rx, ry FROM base
  JOIN rxv USING (xq) JOIN ryv USING (yq)
),
a AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(rx) AS sx, sum(ry) AS sy,
         sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
         sum(rx * ry) AS sxy
  FROM rk
)
SELECT CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS rho
FROM a
""",
)
def q_spearman(spark: SparkSession, sf_dir: str):
    """Spearman rank correlation of quantity vs extended price
    (operators/stats.spearman_rho — the monotone, tie-aware sibling
    of q_grouped_corr's Pearson): doubled midranks from the two
    distinct-value collapses (exact integers; the KS-shape bounded
    windows), then the standard exact decimal moment-sum close."""
    from nextbus2pg_spark.operators.stats import spearman_rho

    li = load_table(spark, sf_dir, "lineitem")
    return spearman_rho(
        li, "l_quantity", "l_extendedprice", x_scale=1, y_scale=100
    )


@fixture(
    "q_adjusted_rand",
    oracle="""
WITH base AS (
  SELECT lang AS a, source AS b FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
),
cells AS (
  SELECT a, b, CAST(count(*) AS HUGEINT) AS nij FROM base GROUP BY a, b
),
sums AS (
  SELECT sum((nij * (nij - 1)) // 2) AS sc, sum(nij) AS n FROM cells
),
ma AS (
  SELECT sum((ni * (ni - 1)) // 2) AS sa
  FROM (SELECT sum(nij) AS ni FROM cells GROUP BY a)
),
mb AS (
  SELECT sum((nj * (nj - 1)) // 2) AS sb
  FROM (SELECT sum(nij) AS nj FROM cells GROUP BY b)
),
f AS (
  SELECT sc, sa, sb, n, (n * (n - 1)) // 2 AS np
  FROM sums, ma, mb
)
SELECT CASE WHEN (sa + sb) * np - 2 * sa * sb <> 0
            THEN CAST(2 * sc * np - 2 * sa * sb AS DOUBLE)
                 / CAST((sa + sb) * np - 2 * sa * sb AS DOUBLE)
       END AS ari,
       CAST(sc AS BIGINT) AS sum_comb,
       CAST(sa AS BIGINT) AS sum_comb_a,
       CAST(sb AS BIGINT) AS sum_comb_b,
       CAST(np AS BIGINT) AS n_pairs,
       CAST(n AS BIGINT) AS n
FROM f
""",
)
def q_adjusted_rand(spark: SparkSession, sf_dir: str):
    """Adjusted Rand index of the document language partition vs the
    source partition (operators/stats.adjusted_rand): exact HUGEINT/
    DECIMAL(38,0) pair-count sums, the classic formula multiplied
    through by 2*n_pairs so numerator and denominator are EXACT
    integers, and one double division — engine-identical to the bit.
    The clustering-vs-reference agreement gate (LPA communities,
    k-means cells, dedup clusters vs a labeled sample)."""
    from nextbus2pg_spark.operators.stats import adjusted_rand

    docs = load_table(spark, sf_dir, "documents")
    return adjusted_rand(docs, "lang", "source")


@fixture(
    "q_bh_fdr",
    oracle="""
WITH pv AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN (CAST((doc_id * 2654435761) % 1000003 AS DOUBLE)
                    / 1000003.0) / 1000.0
              ELSE CAST((doc_id * 2654435761) % 1000003 AS DOUBLE)
                   / 1000003.0 END AS p
  FROM documents
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pv WHERE p IS NOT NULL),
dist AS (SELECT p, count(*) AS c FROM pv WHERE p IS NOT NULL GROUP BY p),
ranked AS (
  SELECT p, sum(c) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING) AS k
  FROM dist
),
thr AS (
  SELECT max(r.p) AS t FROM ranked r, m WHERE r.p * m.m <= 0.05 * r.k
)
SELECT pv.doc_id, pv.p, coalesce(pv.p <= thr.t, FALSE) AS reject
FROM pv, thr
""",
)
def q_bh_fdr(spark: SparkSession, sf_dir: str):
    """Benjamini-Hochberg FDR control over a synthetic per-document
    p-value battery (operators/stats.bh_fdr): 90% uniform nulls
    (integer-hash / prime), 10% thousand-fold-smaller signals; the BH
    pass test is two IEEE multiplications (never a division), the
    ranks come from the distinct-value collapse (ties take the binding
    largest ordinal by construction), and the threshold broadcast is
    one row. The multiple-testing gate for per-feature drift
    batteries."""
    from nextbus2pg_spark.operators.stats import bh_fdr

    docs = load_table(spark, sf_dir, "documents")
    p_raw = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(1000003)
    ).cast("double") / F.lit(1000003.0)
    pv = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, p_raw / F.lit(1000.0))
        .otherwise(p_raw)
        .alias("p"),
    )
    return bh_fdr(pv, "p", alpha=0.05).select("doc_id", "p", "reject")


@fixture(
    "q_frequent_pairs",
    oracle="""
WITH base AS (
  SELECT DISTINCT user_id AS basket, event_type AS item FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM base),
ic AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY item),
pairs AS (
  SELECT x.item AS item_a, y.item AS item_b,
         CAST(count(*) AS BIGINT) AS n_pair
  FROM base x JOIN base y ON x.basket = y.basket AND x.item < y.item
  GROUP BY 1, 2
  HAVING count(*) >= 5
)
SELECT p.item_a, p.item_b, p.n_pair, ca.c AS n_a, cb.c AS n_b,
       nb.n_baskets,
       CAST(nb.n_baskets * p.n_pair AS DOUBLE)
       / CAST(ca.c * cb.c AS DOUBLE) AS lift
FROM pairs p
JOIN ic ca ON ca.item = p.item_a
JOIN ic cb ON cb.item = p.item_b, nb
""",
)
def q_frequent_pairs(spark: SparkSession, sf_dir: str):
    """Frequent event-type pairs per user basket with exact support
    and lift (operators/stats.frequent_pairs): the A-Priori 2-itemset
    pass — distinct (basket, item) collapse, per-basket pair self-join
    bounded by the guarded basket size, integer counts, lift as one
    exact-integer construction + one division."""
    from nextbus2pg_spark.operators.stats import frequent_pairs

    ev = load_table(spark, sf_dir, "events")
    return frequent_pairs(
        ev, "user_id", "event_type", min_support=5
    )


@fixture(
    "q_theil_sen",
    oracle="""
WITH base AS (
  SELECT user_id AS key,
         epoch_us(ts) // 1000000 AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
sizes AS (SELECT key FROM base GROUP BY key),
pairs AS (
  SELECT a.key,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s
  FROM base a JOIN base b ON a.key = b.key AND a.x < b.x
),
dist AS (SELECT key, s, count(*) AS c FROM pairs GROUP BY key, s),
ranked AS (
  SELECT key, s,
         sum(c) OVER (PARTITION BY key ORDER BY s
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM dist
),
totals AS (SELECT key, CAST(count(*) AS BIGINT) AS m FROM pairs
           GROUP BY key),
med AS (
  SELECT r.key, t.m,
         min(CASE WHEN 2 * r.cum >= t.m THEN r.s END) AS lo,
         min(CASE WHEN 2 * r.cum > t.m THEN r.s END) AS hi
  FROM ranked r JOIN totals t USING (key)
  GROUP BY r.key, t.m
)
SELECT z.key AS user_id,
       CAST(coalesce(m.m, 0) AS BIGINT) AS n_pairs,
       (m.lo + m.hi) / 2.0 AS slope
FROM sizes z LEFT JOIN med m USING (key)
""",
)
def q_theil_sen(spark: SparkSession, sf_dir: str):
    """Per-user Theil-Sen robust value trend over event time
    (operators/stats.theil_sen): every pairwise slope is one IEEE
    division of exact integers (epoch-second x, cent-quantized y), and
    the median is computed EXPLICITLY over the distinct-slope collapse
    with pure-integer rank tests (2*cum >= m / 2*cum > m) — engine
    built-in medians interpolate doubles with different expression
    trees, so the operator never calls one. The outlier-immune
    companion to q_grouped_corr's OLS slope."""
    from nextbus2pg_spark.operators.stats import theil_sen

    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    xs = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    base = ev.select("user_id", xs.alias("xsec"), "value")
    return theil_sen(
        base, ["user_id"], "xsec", "value", x_scale=1, y_scale=100
    )
