"""Extended standard-surface fixture queries: ranking, percentiles,
pivot-style conditional aggregation, cube, intersect, date parts,
string functions, histograms, deterministic key generation.

The reference needs none of these (SURVEY.md §2.6-2.9 lists its narrow
surface), but the engine ships the full standard analytic surface per
§2.6's note — every query here is oracle-checked like the core set.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.plans.registry import fixture


@fixture(
    "q_intersect",
    oracle="""
SELECT n_nationkey, n_name FROM nation WHERE n_regionkey IN (0, 1)
INTERSECT
SELECT n_nationkey, n_name FROM nation WHERE n_regionkey IN (1, 2)
""",
)
def q_intersect(spark: SparkSession, sf_dir: str):
    """Set intersection (free in Spark; SURVEY.md §2.8 note)."""
    nation = load_table(spark, sf_dir, "nation")
    a = nation.where(F.col("n_regionkey").isin(0, 1)).select("n_nationkey", "n_name")
    b = nation.where(F.col("n_regionkey").isin(1, 2)).select("n_nationkey", "n_name")
    return a.intersect(b)


@fixture(
    "q_rank_suite",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(rank() OVER w AS INTEGER) AS rnk,
       CAST(dense_rank() OVER w AS INTEGER) AS drnk,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       lead(o_orderkey) OVER w AS next_orderkey,
       lag(o_orderkey) OVER w AS prev_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q_rank_suite(spark: SparkSession, sf_dir: str):
    """Ranking/navigation window surface: rank, dense_rank, ntile,
    lead, lag over a deterministic total order."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@fixture(
    "q_percentile",
    oracle="""
SELECT o_orderstatus,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)
         AS median_price,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4)
         AS p90_price
FROM orders GROUP BY o_orderstatus
""",
)
def q_percentile(spark: SparkSession, sf_dir: str):
    """Continuous percentiles (linear interpolation — identical
    definition in both engines)."""
    return load_table(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(
        F.round(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)"), 4
        ).alias("median_price"),
        F.round(
            F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)"), 4
        ).alias("p90_price"),
    )


@fixture(
    "q_pivot",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
       round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0.0), 2)
         AS total_f
FROM orders GROUP BY o_orderpriority
""",
)
def q_pivot(spark: SparkSession, sf_dir: str):
    """Pivot as conditional aggregation (the portable, partial-agg-
    friendly form; Spark's pivot() sugar compiles to the same plan)."""
    o = load_table(spark, sf_dir, "orders")
    def n_where(status):
        return F.count(F.when(F.col("o_orderstatus") == status, 1))
    return o.groupBy("o_orderpriority").agg(
        n_where("F").alias("n_f"),
        n_where("O").alias("n_o"),
        n_where("P").alias("n_p"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))),
                F.lit(0.0),
            ),
            2,
        ).alias("total_f"),
    )


@fixture(
    "q_cube",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube(spark: SparkSession, sf_dir: str):
    """CUBE grouping sets (all subtotal combinations)."""
    return load_table(spark, sf_dir, "lineitem").cube(
        "l_returnflag", "l_linestatus"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@fixture(
    "q_date_parts",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS y,
       CAST(month(o_orderdate) AS INTEGER) AS m,
       CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(o_orderdate AS DATE) AS d
FROM orders
""",
)
def q_date_parts(spark: SparkSession, sf_dir: str):
    """Date-part extraction + truncation (X4 family). ISO day-of-week
    via Spark's weekday()+1 == DuckDB's isodow (Monday=1)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        (F.weekday("o_orderdate") + F.lit(1)).cast("int").alias("iso_dow"),
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("timestamp_ntz")
        .alias("month_start"),
        F.to_date("o_orderdate").alias("d"),
    )


@fixture(
    "q_string_funcs",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS up,
       lower(c_mktsegment) AS lo,
       substr(c_name, 1, 8) AS head,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
       trim(concat('  ', c_name, '  ')) AS trimmed,
       length(c_name) AS name_len
FROM customer
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str):
    """Core string surface: case, substr, pad, trim, length."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("head"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.length("c_name").alias("name_len"),
    )


@fixture(
    "q_histogram",
    oracle="""
SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       count(*) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders GROUP BY 1
""",
)
def q_histogram(spark: SparkSession, sf_dir: str):
    """Fixed-width histogram binning via floor division — the
    shuffle-light profiling primitive."""
    bucket = F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("long")
    return load_table(spark, sf_dir, "orders").groupBy(
        bucket.alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@fixture(
    "q_keygen_deterministic",
    oracle="""
SELECT n_nationkey,
       concat(substr(h, 1, 8), '-', substr(h, 9, 4), '-',
              substr(h, 13, 4), '-', substr(h, 17, 4), '-',
              substr(h, 21, 12)) AS nation_uuid
FROM (SELECT n_nationkey, md5(concat('nation:', n_name)) AS h FROM nation)
""",
)
def q_keygen_deterministic(spark: SparkSession, sf_dir: str):
    """Deterministic surrogate-key generation (SURVEY.md §7 hard-part
    #4): uuid-shaped md5 of the business key — injectable, testable
    replacement for uuid4 (``agency.py:52``); ``q_keygen_uuid`` keeps
    the nondeterministic uuid() form."""
    h = F.md5(F.concat(F.lit("nation:"), F.col("n_name")))
    uuid_shaped = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey", uuid_shaped.alias("nation_uuid")
    )


@fixture(
    "q_approx_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS approx_within_bounds
FROM lineitem GROUP BY l_returnflag
""",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str):
    """approx_count_distinct (HyperLogLog++): sketch-based distinct at
    scale. The sketch VALUE is engine-specific (DuckDB cannot rebuild
    Spark's HLL), so the checkable output is the exact count plus a
    deterministic validity flag: the HLL++ estimate (rsd 0.05, no RNG
    — identical on every run over this fixed input) must sit within 3×
    the configured relative standard deviation of the exact count. A
    sketch regression (wrong merge, wrong relativeSD plumbing) flips
    the flag and breaks the hash match."""
    rsd = 0.05
    agg = load_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd).alias("__approx"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("__approx") - F.col("exact_orders"))
            <= F.lit(3 * rsd) * F.col("exact_orders")
        ).alias("approx_within_bounds"),
    )


@fixture(
    "q_json_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       json_extract_string(props, '$.k') AS k_str
FROM events
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str):
    """Semi-structured surface: JSON path extraction from a string
    column (events.props), typed and string forms."""
    from nextbus2pg_spark.catalog import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.get_json_object("props", "$.k").alias("k_str"),
    )


@fixture(
    "q_text_clean",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(lower(replace(text, '  ', ' ')),
                           '[ ]+', ' ', 'g')) AS clean,
       regexp_replace(text, '[0-9]+', '#', 'g') AS digit_masked
FROM documents
""",
)
def q_text_clean(spark: SparkSession, sf_dir: str):
    """Text normalization + PII-style masking: lowercase, whitespace
    collapse, digit-run redaction (regexp semantics identical in Java
    regex and RE2 for these classes)."""
    from nextbus2pg_spark.catalog import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.lower(F.replace(F.col("text"), F.lit("  "), F.lit(" "))),
                "[ ]+",
                " ",
            )
        ).alias("clean"),
        F.regexp_replace(F.col("text"), "[0-9]+", "#").alias("digit_masked"),
    )


@fixture(
    "q_array_funcs",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       round(CAST(list_sort(CAST(embedding AS DOUBLE[]))[1] AS DOUBLE), 6)
         AS min_val,
       round(CAST(list_sort(CAST(embedding AS DOUBLE[]))[len(embedding)]
             AS DOUBLE), 6) AS max_val,
       round(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> abs(x))), 6) AS l1_norm
FROM embeddings
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str):
    """Array-function surface: size, indexing, sort, element-wise
    transform + fold — all JVM-side array expressions."""
    from nextbus2pg_spark.catalog import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    srt = F.array_sort(as_double)
    l1 = F.aggregate(
        as_double, F.lit(0.0), lambda acc, x: acc + F.abs(x)
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(F.col("embedding"), 1).cast("double"), 6).alias(
            "first_val"
        ),
        F.round(F.element_at(srt, 1), 6).alias("min_val"),
        F.round(F.element_at(srt, -1), 6).alias("max_val"),
        F.round(l1, 6).alias("l1_norm"),
    )


# Shared ANSI SQL run verbatim by BOTH engines (Spark via catalog.sql,
# DuckDB as the oracle) — exercises Catalyst's subquery decorrelation.
_SCALAR_SUBQUERY_SQL = """
SELECT o_orderkey, o_custkey,
       (SELECT count(*) FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey) AS n_lines
FROM orders o
WHERE o_orderstatus = 'F'
"""

_IN_SUBQUERY_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation WHERE n_regionkey = 1
)
"""


@fixture("q_scalar_subquery", oracle=_SCALAR_SUBQUERY_SQL)
def q_scalar_subquery(spark: SparkSession, sf_dir: str):
    """Correlated scalar subquery — same ANSI text runs on both engines;
    Catalyst decorrelates it to an aggregate + outer join."""
    from nextbus2pg_spark.catalog import sql as _sql

    return _sql(spark, _SCALAR_SUBQUERY_SQL, sf_dir)


@fixture("q_in_subquery", oracle=_IN_SUBQUERY_SQL)
def q_in_subquery(spark: SparkSession, sf_dir: str):
    """IN-subquery predicate (planned as a left-semi join)."""
    from nextbus2pg_spark.catalog import sql as _sql

    return _sql(spark, _IN_SUBQUERY_SQL, sf_dir)


# ---------------------------------------------------------------------------
# TPC-H-shape multi-join aggregates (Q3/Q5/Q10 adapted to the trimmed
# testdata schema — no o_shippriority / c_address / receipt dates; date
# filters shifted into the synthetic 1995-2001 range). These are the
# canonical "analytics engine" plans: selective dim filter → fact join →
# grouped aggregate → deterministic top-N. At scale the dimension side
# broadcasts and AQE picks join order; the only big shuffle is the
# final group-by on the (already filtered) fact rows.
# ---------------------------------------------------------------------------

@fixture(
    "q_tpch_q3",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate > TIMESTAMP '1997-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str):
    """TPC-H Q3 shipping-priority shape: two selective filters, two
    joins, grouped revenue, top-10. Tie-break on l_orderkey makes the
    LIMIT deterministic cross-engine; ordering uses the ROUNDED revenue
    so both engines rank identical values."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp_ntz")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@fixture(
    "q_tpch_q5",
    oracle="""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str):
    """TPC-H Q5 local-supplier-volume shape: five joins (four of them
    broadcast-size dims), the local-supplier constraint
    c_nationkey = s_nationkey, one grouped aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@fixture(
    "q_tpch_q10",
    oracle="""
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str):
    """TPC-H Q10 returned-item shape: quarter of orders × returned
    lines, customer rollup, deterministic top-20 by revenue."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            "n_name",
        )
    )


@fixture(
    "q_key_skew",
    oracle="""
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
),
total AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM events),
ranked AS (
  SELECT user_id, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, user_id) AS INTEGER)
           AS rank
  FROM counts
)
SELECT user_id, cnt, round(cnt / total.t, 6) AS share, rank
FROM ranked CROSS JOIN total WHERE rank <= 20
""",
)
def q_key_skew(spark: SparkSession, sf_dir: str):
    """Heavy-hitter key profile: top-20 join/agg keys by row count with
    their share of the table — the measurement that decides whether a
    key needs salting (operators/scale.py salted_join/salted_agg). Hash
    agg + broadcast total; the window runs over distinct keys only."""
    from nextbus2pg_spark.operators.scale import key_skew_profile

    ev = load_table(spark, sf_dir, "events")
    return key_skew_profile(ev, ["user_id"], top_n=20)


def _morton_oracle_terms(col_a: str, col_b: str, mod: int, bits: int) -> str:
    """The Z-value bit-interleave as portable SQL (generated, since the
    expression is a fixed unrolled loop — identical tree to
    operators/layout.py morton_interleave)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({col_a} % {mod}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({col_b} % {mod}) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@fixture(
    "q_zorder_key",
    oracle=f"""
SELECT o_orderkey,
       CAST({_morton_oracle_terms("o_custkey", "o_orderkey", 256, 8)}
            AS BIGINT) AS zval
FROM orders
""",
)
def q_zorder_key(spark: SparkSession, sf_dir: str):
    """Morton (Z-order) key over two quantized key columns — the
    data-layout primitive behind multi-column data skipping
    (operators/layout.py zorder_layout). Pure integer bit arithmetic,
    codegen'd, bit-identical across engines."""
    from nextbus2pg_spark.operators.layout import morton_interleave

    o = load_table(spark, sf_dir, "orders")
    z = morton_interleave(
        [F.col("o_custkey") % 256, F.col("o_orderkey") % 256], bits=8
    )
    return o.select("o_orderkey", z.cast("long").alias("zval"))


@fixture(
    "q_histogram_quantile",
    oracle="""
WITH b AS (
  SELECT event_type,
         greatest(0, least(31, CAST(floor((value - 0.0) / 15.625) AS INT)))
           AS bin
  FROM events WHERE value IS NOT NULL
),
t AS (SELECT event_type, count(*) AS n FROM b GROUP BY 1),
c AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS total
  FROM c
),
qs AS (SELECT * FROM (VALUES (0.5), (0.95)) v(q)),
hit AS (
  SELECT event_type, q, bin, cnt, cum, total,
         row_number() OVER (PARTITION BY event_type, q ORDER BY bin) AS rn
  FROM cum CROSS JOIN qs
  WHERE CAST(cum AS DOUBLE) >= q * CAST(total AS DOUBLE)
),
vals AS (
  SELECT event_type, q,
         0.0 + 15.625 * (CAST(bin AS DOUBLE)
           + (q * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
             / CAST(cnt AS DOUBLE)) AS v
  FROM hit WHERE rn = 1
)
SELECT t.event_type, CAST(t.n AS BIGINT) AS n,
       round(max(CASE WHEN q = 0.5 THEN v END), 6) AS p50,
       round(max(CASE WHEN q = 0.95 THEN v END), 6) AS p95
FROM vals JOIN t USING (event_type)
GROUP BY 1, 2
""",
)
def q_histogram_quantile(spark: SparkSession, sf_dir: str):
    """Quantiles from MERGEABLE fixed-bin histogram state
    (operators/sketch.histogram_*): one partial-aggregatable pass
    builds a 32-bin count array per event type; p50/p95 derive from
    the array by interpolated cumulative walk. The scale point vs
    exact percentile: no global sort, state is 32 longs per group
    regardless of row count, and the same state merges across
    batches/days (pipelines/continuous_aggregate) — the oracle replays
    the identical estimator in SQL, so the whole path is value-checked,
    unlike an engine-opaque approx_percentile sketch."""
    from nextbus2pg_spark.operators.sketch import (
        histogram_quantile,
        histogram_state,
    )

    ev = load_table(spark, sf_dir, "events")
    st = ev.groupBy("event_type").agg(
        histogram_state(F.col("value"), 0.0, 500.0, 32).alias("h")
    )
    return st.select(
        "event_type",
        F.aggregate("h", F.lit(0).cast("long"), lambda a, x: a + x).alias("n"),
        F.round(
            histogram_quantile(F.col("h"), 0.5, 0.0, 500.0, 32), 6
        ).alias("p50"),
        F.round(
            histogram_quantile(F.col("h"), 0.95, 0.0, 500.0, 32), 6
        ).alias("p95"),
    )
