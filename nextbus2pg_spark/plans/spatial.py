"""Spatial fixture queries: grid-bucketed distance joins.

The reference's tables carry PostGIS POINT columns it never queries
(``sql/create_tables.sql:75,119``); these fixtures are the distance
joins a user of that schema writes next ("nearest stop to each vehicle
location"), in the grid-join shape that survives 100 TB
(``operators/spatial.py``).

Coordinates are derived deterministically from integer keys with pure
IEEE arithmetic (int mod → ×0.5 → −35.0), expression-tree-identical in
the Spark plan and the DuckDB oracle, so the driver's value hash is
exact — no trig in the oracle-checked path (trig last-ulp behavior is
libm-specific; the haversine variant is pinned by unit tests instead,
``tests/test_spatial.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.operators.spatial import (
    grid_nearest_join,
    within_radius_join,
)
from nextbus2pg_spark.plans.registry import fixture

#: Search radius in degrees (grid pitch = radius ⇒ 3×3 cover is exact).
RADIUS_DEG = 2.0

_POINTS_SQL = """
  SELECT event_id AS point_id,
         (event_id % 140) * CAST(0.5 AS DOUBLE) - CAST(35.0 AS DOUBLE) AS lat,
         ((event_id * 7 + user_id) % 140) * CAST(0.5 AS DOUBLE)
           - CAST(35.0 AS DOUBLE) AS lon
  FROM events
"""

_SITES_SQL = """
  SELECT s_suppkey AS site_id,
         (s_suppkey % 70) * CAST(1.0 AS DOUBLE) - CAST(35.0 AS DOUBLE) AS slat,
         ((s_suppkey * 3) % 70) * CAST(1.0 AS DOUBLE)
           - CAST(35.0 AS DOUBLE) AS slon
  FROM supplier
"""


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vehicle-position stand-in: one synthetic lon/lat per event."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("point_id"),
        ((F.col("event_id") % F.lit(140)) * F.lit(0.5) - F.lit(35.0)).alias("lat"),
        (
            ((F.col("event_id") * F.lit(7) + F.col("user_id")) % F.lit(140))
            * F.lit(0.5)
            - F.lit(35.0)
        ).alias("lon"),
    )


def _sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop stand-in: one synthetic lon/lat per supplier."""
    sup = load_table(spark, sf_dir, "supplier")
    return sup.select(
        F.col("s_suppkey").alias("site_id"),
        ((F.col("s_suppkey") % F.lit(70)) * F.lit(1.0) - F.lit(35.0)).alias("slat"),
        (
            ((F.col("s_suppkey") * F.lit(3)) % F.lit(70)) * F.lit(1.0)
            - F.lit(35.0)
        ).alias("slon"),
    )


@fixture(
    "q_nearest_site",
    oracle=f"""
WITH p AS ({_POINTS_SQL}),
s AS ({_SITES_SQL}),
hits AS (
  SELECT p.point_id, s.site_id,
         (p.lat - s.slat) * (p.lat - s.slat)
       + (p.lon - s.slon) * (p.lon - s.slon) AS distance
  FROM p CROSS JOIN s
  WHERE (p.lat - s.slat) * (p.lat - s.slat)
      + (p.lon - s.slon) * (p.lon - s.slon) <= CAST(4.0 AS DOUBLE)
)
SELECT point_id, site_id, distance FROM (
  SELECT hits.*, row_number() OVER (
    PARTITION BY point_id ORDER BY distance, site_id
  ) AS rn FROM hits
) WHERE rn = 1
""",
)
def q_nearest_site(spark: SparkSession, sf_dir: str):
    """Nearest site within 2° of each point — grid-bucketed equi-join
    + min_by winner (the 100 TB shape; the oracle is the naive cross
    join, which is only viable at fixture scale)."""
    return grid_nearest_join(
        _points(spark, sf_dir),
        _sites(spark, sf_dir),
        radius=RADIUS_DEG,
        point_id="point_id",
        site_id="site_id",
    )


@fixture(
    "q_radius_count",
    oracle=f"""
WITH p AS ({_POINTS_SQL}),
s AS ({_SITES_SQL})
SELECT p.point_id,
       count(*) AS n_nearby,
       min((p.lat - s.slat) * (p.lat - s.slat)
         + (p.lon - s.slon) * (p.lon - s.slon)) AS min_d2
FROM p CROSS JOIN s
WHERE (p.lat - s.slat) * (p.lat - s.slat)
    + (p.lon - s.slon) * (p.lon - s.slon) <= CAST(4.0 AS DOUBLE)
GROUP BY p.point_id
""",
)
def q_radius_count(spark: SparkSession, sf_dir: str):
    """Site density within 2° of each point (count + closest squared
    distance) — the within-radius grid join aggregated per point."""
    pairs = within_radius_join(
        _points(spark, sf_dir),
        _sites(spark, sf_dir),
        radius=RADIUS_DEG,
    )
    return pairs.groupBy("point_id").agg(
        F.count(F.lit(1)).alias("n_nearby"),
        F.min("distance").alias("min_d2"),
    )
