"""Shared fixtures: one local SparkSession + a DuckDB oracle connection
with the testdata tables registered as views (mirrors the driver's
correctness harness)."""

from __future__ import annotations

import os

import duckdb
import pytest

from nextbus2pg_spark.catalog import TABLES
from nextbus2pg_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_DIR_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Executor python workers inherit PYTHONPATH from the driver env at
    # session start; include repo + tests so classes defined in test
    # modules (fake sinks, etc.) unpickle on workers.
    here = os.path.dirname(__file__)
    repo = os.path.dirname(here)
    extra = os.pathsep.join([repo, here])
    prev = os.environ.get("PYTHONPATH")
    os.environ["PYTHONPATH"] = (
        extra + (os.pathsep + prev if prev else "")
    )
    spark = get_spark("nextbus2pg-tests")
    yield spark
    spark.stop()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "soak: slow soak/property sweep — skipped unless "
        "SPARK_GRAFT_SOAK=1 (round-13 verdict item 1: the full suite "
        "outgrew the driver's verify window; the default run is the "
        "fast gate, the soak tier runs on demand and before round "
        "close)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_SOAK"):
        return
    skip = pytest.mark.skip(
        reason="soak tier: set SPARK_GRAFT_SOAK=1 to run"
    )
    for item in items:
        if "soak" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
