"""Spatial operators: haversine accuracy, grid-join exactness vs the
naive cross join, and the column-collision guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nextbus2pg_spark.functions.geo import haversine_km, sq_degree_distance
from nextbus2pg_spark.operators.spatial import (
    grid_nearest_join,
    within_radius_join,
)


def _points(spark, n=300):
    # Deterministic scatter over ±30° from the row id (no rand()).
    return spark.range(n).select(
        F.col("id").alias("point_id"),
        ((F.col("id") * 37 % 120) * F.lit(0.5) - F.lit(30.0)).alias("lat"),
        ((F.col("id") * 53 % 120) * F.lit(0.5) - F.lit(30.0)).alias("lon"),
    )


def _sites(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("site_id"),
        ((F.col("id") * 11 % 60) * F.lit(1.0) - F.lit(30.0)).alias("slat"),
        ((F.col("id") * 29 % 60) * F.lit(1.0) - F.lit(30.0)).alias("slon"),
    )


def test_haversine_known_distances(spark):
    rows = spark.createDataFrame(
        [
            # Paris → London ≈ 343.5 km
            (48.8566, 2.3522, 51.5074, -0.1278, 343.5),
            # one degree of longitude on the equator ≈ 111.19 km
            (0.0, 0.0, 0.0, 1.0, 111.19),
            # antipodal-ish: pole to pole is half the circumference
            (90.0, 0.0, -90.0, 0.0, 20015.1),
        ],
        "lat1 double, lon1 double, lat2 double, lon2 double, want double",
    ).select(
        "want",
        haversine_km("lat1", "lon1", "lat2", "lon2").alias("got"),
    )
    for r in rows.collect():
        assert r.got == pytest.approx(r.want, rel=0.01), r


def test_grid_nearest_matches_bruteforce(spark):
    p, s = _points(spark), _sites(spark)
    got = {
        r.point_id: (r.site_id, r.distance)
        for r in grid_nearest_join(
            p, s, radius=2.0, point_id="point_id", site_id="site_id"
        ).collect()
    }
    # Brute force: cross join, same metric, argmin by (distance, id).
    d2 = sq_degree_distance("lat", "lon", "slat", "slon")
    brute = (
        p.crossJoin(s)
        .withColumn("distance", d2)
        .where(F.col("distance") <= 4.0)
        .groupBy("point_id")
        .agg(
            F.min_by(
                F.struct("site_id", "distance"),
                F.struct("distance", "site_id"),
            ).alias("b")
        )
        .select("point_id", "b.site_id", "b.distance")
    )
    want = {r.point_id: (r.site_id, r.distance) for r in brute.collect()}
    assert got == want
    assert want, "fixture degenerate: no point had a site in range"


def test_within_radius_haversine_matches_bruteforce(spark):
    p, s = _points(spark, 120), _sites(spark, 25)
    got = {
        (r.point_id, r.site_id)
        for r in within_radius_join(
            p, s, radius=150.0, metric="haversine_km"
        ).collect()
    }
    want = {
        (r.point_id, r.site_id)
        for r in p.crossJoin(s)
        .withColumn("d", haversine_km("lat", "lon", "slat", "slon"))
        .where(F.col("d") <= 150.0)
        .collect()
    }
    assert got == want and want


def test_within_radius_haversine_high_latitude(spark):
    """Regression: longitude degrees shrink by cos(lat), so the grid
    pitch must over-cover by 1/cos(lat). With the old 1.5 factor, pairs
    near the radius boundary in longitude were silently missed between
    ~48° and 60° latitude; the 2.0 factor is provably safe to 60°."""
    # At 55°N the 150 km radius spans 2.35° of longitude but the old
    # pitch was only 2.02°; the 0.11°/0.55° lon steps land 79 true
    # pairs inside that (2.02°, 2.35°] window (verified offline), so
    # this test fails under the 1.5 factor.
    p = spark.range(120).select(
        F.col("id").alias("point_id"),
        (F.lit(55.0) + (F.col("id") * 37 % 20) * F.lit(0.005)).alias("lat"),
        ((F.col("id") * 53 % 200) * F.lit(0.11)).alias("lon"),
    )
    s = spark.range(25).select(
        F.col("id").alias("site_id"),
        (F.lit(55.0) + (F.col("id") * 11 % 20) * F.lit(0.005)).alias("slat"),
        ((F.col("id") * 29 % 40) * F.lit(0.55)).alias("slon"),
    )
    got = {
        (r.point_id, r.site_id)
        for r in within_radius_join(
            p, s, radius=150.0, metric="haversine_km"
        ).collect()
    }
    want = {
        (r.point_id, r.site_id)
        for r in p.crossJoin(s)
        .withColumn("d", haversine_km("lat", "lon", "slat", "slon"))
        .where(F.col("d") <= 150.0)
        .collect()
    }
    assert got == want and want


def test_collision_guard(spark):
    p = _points(spark, 10)
    with pytest.raises(ValueError, match="rename colliding"):
        within_radius_join(p, p, radius=1.0)
