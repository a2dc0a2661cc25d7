"""Driver-contract smoke tests: entry() on sf0.001 (rows > 0, stable
schema), queries()/oracle_sql() key alignment."""

from __future__ import annotations

import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
entry_mod = importlib.util.module_from_spec(spec)
sys.modules["__spark_entry__"] = entry_mod
spec.loader.exec_module(entry_mod)


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "user_id", "event_type", "c_name", "c_mktsegment",
        "last_ts", "last_value", "n_events",
    }


def test_contract_key_alignment():
    from nextbus2pg_spark.plans import ROWS_ONLY

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q), "oracle keys must be a subset of queries"
    assert len(q) >= 60
    # Oracle-less queries are exactly the explicitly-declared rows-only
    # set (registry.fixture raises if a query declares neither).
    assert set(q) - set(o) == ROWS_ONLY


def test_queries_run_at_sf0001(spark):
    q = entry_mod.queries()
    for name in ["q_scan_full", "q_tpch_q1", "q_flagship_latest"]:
        assert q[name](spark, "/root/testdata/sf0.001").count() >= 0


def test_fixtures_md_staleness_ledger_is_current():
    """FIXTURES.md §C embeds plans.staleness_table() verbatim between
    STALENESS markers — the auditable rotation ledger the round-7
    verdict asked for. Regenerate it whenever DRIVER_CHECKED_R{N} or
    the registry changes (the generator script lives in the ledger's
    own BEGIN marker comment)."""
    import re

    from nextbus2pg_spark.plans import staleness_table

    with open("/root/repo/FIXTURES.md") as f:
        text = f.read()
    m = re.search(
        r"<!-- STALENESS:BEGIN.*?-->\n(.*?)<!-- STALENESS:END -->",
        text,
        flags=re.S,
    )
    assert m, "FIXTURES.md is missing the STALENESS ledger section"
    assert m.group(1).strip() == staleness_table().strip()
