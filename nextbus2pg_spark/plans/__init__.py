"""Fixture-query plan registry.

``QUERIES`` maps fixture-query name → callable(spark, sf_dir) → DataFrame
(the Spark plan); ``ORACLE`` maps the same name → ANSI SQL that DuckDB
runs over identically named views of the same parquet (the driver's
correctness gate). Names without an ORACLE entry get the weaker
rows-only check (nondeterministic outputs: uuid, LSH internals).
"""

from nextbus2pg_spark.plans.registry import ORACLE, QUERIES, ROWS_ONLY, fixture

# Importing the modules populates the registry.
from nextbus2pg_spark.plans import fixtures as _fixtures  # noqa: F401,E402
from nextbus2pg_spark.plans import northstar as _northstar  # noqa: F401,E402
from nextbus2pg_spark.plans import extended as _extended  # noqa: F401,E402
from nextbus2pg_spark.plans import relational as _relational  # noqa: F401,E402
from nextbus2pg_spark.plans import tpch_full as _tpch_full  # noqa: F401,E402
from nextbus2pg_spark.plans import curation as _curation  # noqa: F401,E402
from nextbus2pg_spark.plans import textstats as _textstats  # noqa: F401,E402
from nextbus2pg_spark.plans import spatial as _spatial  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLE", "ROWS_ONLY", "fixture"]
