"""K3/K4 NULL-tolerant upserts executed against a REAL PostgreSQL with
the reference's expression unique indexes (closes round-3 "Next round"
#8: DuckDB accepts an expression unique INDEX but cannot name a
COALESCE conflict target, so the explicit-target DO UPDATE statements
the engine emits for Postgres deployment mode had never executed
against a store that supports them).

The container ships Postgres server binaries; the fixture initdb's a
throwaway cluster into tmp and serves it over a unix socket (run as
``nobody`` via runuser — postgres refuses to run as root). SQL goes
through ``psql`` (no Python driver installed); statements under test
are EXACTLY what ``sinks.upsert.pg_upsert_statement`` renders, with the
``VALUES %s`` placeholder expanded to literal rows the way
``execute_values`` would.

Reference semantics being proven (sql/create_tables.sql:62-63,85-86;
agency.py:96-109,176-190):
- service: conflict target ``(route_id, COALESCE(tag, ''))`` — two
  NULL-tag snapshots for one route collapse to ONE row, the first
  surrogate id survives, the payload updates (K3).
- stop: conflict target ``(route_id, tag, COALESCE(location, ''))``
  over the canonical TEXT form of the point (X10) — NULL-location
  repair rows upsert against the same index (K4).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

from nextbus2pg_spark.sinks.upsert import pg_upsert_statement

pytestmark = pytest.mark.skipif(
    not (
        shutil.which("psql")
        and os.path.exists("/usr/local/bin/initdb")
        and shutil.which("runuser")
    ),
    reason="postgres server binaries not available",
)


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    return "'" + str(v).replace("'", "''") + "'"


def _render(statement: str, rows: list[tuple]) -> str:
    """Expand the execute_values-style ``VALUES %s`` placeholder into
    literal row tuples — byte-for-byte the statement psycopg2 would
    send (execute_values does exactly this textual expansion)."""
    values = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in row) + ")" for row in rows
    )
    return statement.replace("VALUES %s", f"VALUES {values}", 1)


@pytest.fixture(scope="module")
def pg():
    # A plain /tmp dir, not pytest's tmp_path: the pytest basetemp
    # chain is 0700 root-owned and `nobody` (which postgres must run
    # as) cannot traverse it.
    import pathlib
    import tempfile

    base = pathlib.Path(tempfile.mkdtemp(prefix="pgtest-", dir="/tmp"))
    os.chmod(base, 0o777)
    data = base / "data"
    sock = base / "sock"
    sock.mkdir()
    os.chmod(sock, 0o777)

    def as_nobody(*cmd, **kw):
        # cwd must be readable by nobody (the test process sits in a
        # root-only directory, which runuser would fail to chdir into)
        return subprocess.run(
            ["runuser", "-u", "nobody", "--", *cmd],
            capture_output=True, text=True, cwd=str(base), **kw,
        )

    r = as_nobody(
        "/usr/local/bin/initdb", "-D", str(data), "-A", "trust",
        "-U", "pguser",
    )
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    r = as_nobody(
        "/usr/local/bin/pg_ctl", "-D", str(data),
        "-l", str(base / "pg.log"), "-w",
        "-o", f"-k {sock} -c listen_addresses=''",
        "start",
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")

    def run_sql(sql: str) -> str:
        p = subprocess.run(
            [
                "psql", "-h", str(sock), "-U", "pguser", "-d", "postgres",
                "-v", "ON_ERROR_STOP=1", "-At", "-c", sql,
            ],
            capture_output=True, text=True, cwd=str(base),
        )
        assert p.returncode == 0, f"psql failed: {p.stderr}\nSQL: {sql}"
        return p.stdout.strip()

    yield run_sql
    as_nobody("/usr/local/bin/pg_ctl", "-D", str(data), "-m", "fast", "stop")
    shutil.rmtree(base, ignore_errors=True)


def test_k3_null_tolerant_service_upsert_executes(pg):
    """K3 against the real expression index: NULL-tag rows conflict
    through COALESCE(tag, ''), the existing surrogate id wins, the
    payload updates, and a distinct-tag row inserts fresh."""
    pg(
        "CREATE TABLE service (service_id TEXT, route_id TEXT, tag TEXT,"
        " name TEXT);"
        "CREATE UNIQUE INDEX service_key ON service"
        " (route_id, COALESCE(tag, ''))"
    )
    stmt = pg_upsert_statement(
        table="service",
        columns=["service_id", "route_id", "tag", "name"],
        key_cols=["route_id", "tag"],
        update_cols=["name"],
        null_safe_keys=["tag"],
    )
    assert "COALESCE(tag, '')" in stmt  # explicit Postgres target
    pg(_render(stmt, [("s1", "r1", None, "first"),
                      ("s2", "r1", "38R_out", "outbound")]))
    # second snapshot: fresh surrogate s9 must be DISCARDED, name wins
    pg(_render(stmt, [("s9", "r1", None, "second")]))
    rows = pg(
        "SELECT service_id, COALESCE(tag, '<null>'), name"
        " FROM service ORDER BY 1"
    ).splitlines()
    assert rows == ["s1|<null>|second", "s2|38R_out|outbound"]


def test_k4_stop_upsert_with_location_text_key_executes(pg):
    """K4: the stop key includes the canonical TEXT form of the point
    (X10) with NULL repair-rows coalescing to '' — both forms execute
    against the real index, and within-batch duplicates are deduped
    before the statement (DISTINCT ON equivalent, agency.py:184)."""
    pg(
        "CREATE TABLE stop (stop_id TEXT, route_id TEXT, tag TEXT,"
        " location TEXT, name TEXT);"
        "CREATE UNIQUE INDEX stop_key ON stop"
        " (route_id, tag, COALESCE(location, ''))"
    )
    stmt = pg_upsert_statement(
        table="stop",
        columns=["stop_id", "route_id", "tag", "location", "name"],
        key_cols=["route_id", "tag", "location"],
        update_cols=["name"],
        null_safe_keys=["location"],
    )
    batch = [
        ("p1", "r1", "main", "-122.4,37.7", "Main St"),
        ("p1", "r1", "main", "-122.4,37.7", "Main St"),  # in-batch dup
        ("p2", "r1", "elm", None, "repaired"),            # NULL location
    ]
    deduped = list(dict.fromkeys(batch))  # A1 dedup before the statement
    pg(_render(stmt, deduped))
    pg(_render(stmt, [("p9", "r1", "elm", None, "repaired-2")]))
    rows = pg(
        "SELECT stop_id, tag, COALESCE(location, '<null>'), name"
        " FROM stop ORDER BY 1"
    ).splitlines()
    assert rows == [
        "p1|main|-122.4,37.7|Main St",
        "p2|elm|<null>|repaired-2",
    ]


def test_k5_insert_if_absent_executes(pg):
    """K5 DO NOTHING (agency.py:221-232): re-running the same batch is
    a no-op on the real store."""
    pg(
        "CREATE TABLE sso (service_id TEXT, stop_order INT, ts TEXT,"
        " CONSTRAINT sso_key UNIQUE (service_id, stop_order, ts),"
        " CONSTRAINT sso_pos CHECK (stop_order > 0));"
    )
    stmt = pg_upsert_statement(
        table="sso",
        columns=["service_id", "stop_order", "ts"],
        key_cols=["service_id", "stop_order", "ts"],
        do_nothing=True,
    )
    rows = [("s1", 1, "2026-01-01"), ("s1", 2, "2026-01-01")]
    pg(_render(stmt, rows))
    pg(_render(stmt, rows))  # idempotent re-run
    assert pg("SELECT count(*) FROM sso") == "2"
