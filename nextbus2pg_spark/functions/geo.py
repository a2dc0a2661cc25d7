"""Geospatial scalar expressions (JVM-side, codegen'd — no UDFs).

The reference stores PostGIS ``GEOMETRY(POINT, 4326)`` columns
(``sql/create_tables.sql:75,119``) but only ever *constructs* points
(``agency.py:179,308``) — it runs no spatial predicate. This module is
the natural extension a user of that schema reaches for next: distance
between points and the grid binning that makes distance joins scale
(see ``operators/spatial.py``).

Everything here is a plain Column expression tree:

- arithmetic forms (``sq_degree_distance``, ``grid_cell``) are exact
  IEEE-754 — bit-identical across Spark and any other engine, so they
  are safe for value-hashed oracle checks;
- ``haversine_km`` uses trig intrinsics whose last-ulp behavior differs
  between libm implementations, so it is pinned by unit tests against
  known city distances instead of a hash oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mean Earth radius (IUGG), km.
EARTH_RADIUS_KM = 6371.0088


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sq_degree_distance(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str
) -> Column:
    """Squared euclidean distance in degree space.

    Monotone in true distance over small extents (and exactly the metric
    a grid index buckets by), with the property that +, -, × on doubles
    are correctly-rounded IEEE ops — the result is bit-identical in every
    engine, unlike trig-based distances.
    """
    dlat = _c(lat1) - _c(lat2)
    dlon = _c(lon1) - _c(lon2)
    return dlat * dlat + dlon * dlon


def haversine_km(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str
) -> Column:
    """Great-circle distance in kilometers (haversine formula).

    All built-in trig (``sin``/``cos``/``asin``/``radians``) — one
    whole-stage-codegen'd expression, no Python.
    """
    la1, lo1 = F.radians(_c(lat1)), F.radians(_c(lon1))
    la2, lo2 = F.radians(_c(lat2)), F.radians(_c(lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    h = (
        F.pow(F.sin(dlat / F.lit(2.0)), 2)
        + F.cos(la1) * F.cos(la2) * F.pow(F.sin(dlon / F.lit(2.0)), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def grid_cell(
    lat: Column | str, lon: Column | str, cell_deg: float
) -> tuple[Column, Column]:
    """(lat, lon) → integer grid-cell coordinates at ``cell_deg`` pitch.

    ``floor(x / c)`` on doubles: division and floor are correctly-rounded
    IEEE ops, so cell assignment is deterministic and engine-portable.
    Returns the two cell coordinates separately so callers can use them
    as plain equi-join keys (a struct key would also work; longs keep the
    shuffle hash cheap).
    """
    return (
        F.floor(_c(lat) / F.lit(float(cell_deg))).cast("long"),
        F.floor(_c(lon) / F.lit(float(cell_deg))).cast("long"),
    )
