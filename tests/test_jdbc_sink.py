"""JDBC upsert sink tests: the foreachBatch writer executes one
multi-row ON CONFLICT statement per partition through an injected
DB-API connection (no Postgres in the container — a file-backed fake
connection captures what executors execute)."""

from __future__ import annotations

import glob
import json
import os

from nextbus2pg_spark.sinks.upsert import jdbc_upsert_writer

_CAPTURE_DIR = "/tmp/nb2pg_jdbc_capture"


class _FileCursor:
    """Fake DB-API cursor that journals execute() calls to disk (the
    only channel back from executor processes in local mode)."""

    def execute(self, sql, params=None):
        os.makedirs(_CAPTURE_DIR, exist_ok=True)
        path = os.path.join(_CAPTURE_DIR, f"{os.getpid()}_{id(self)}.json")
        with open(path, "a") as f:
            f.write(json.dumps({"sql": sql, "params": list(params or [])}) + "\n")


class _FileConn:
    def cursor(self):
        return _FileCursor()

    def commit(self):
        pass

    def close(self):
        pass


def _captured():
    out = []
    for p in glob.glob(os.path.join(_CAPTURE_DIR, "*.json")):
        with open(p) as f:
            out.extend(json.loads(line) for line in f)
    return out


def test_foreach_batch_jdbc_upsert(spark, tmp_path):
    for p in glob.glob(os.path.join(_CAPTURE_DIR, "*.json")):
        os.remove(p)

    batch = spark.createDataFrame(
        [("sf", "38R", "one"), ("sf", "38R", "one"), ("sf", "1", "two")],
        "agency_id string, tag string, name string",
    ).coalesce(1)

    writer = jdbc_upsert_writer(
        table="nextbus.route",
        key_cols=["agency_id", "tag"],
        update_cols=["name"],
        connection_factory=_FileConn,
    )
    writer(batch, batch_id=0)

    calls = _captured()
    assert len(calls) == 1  # one partition → one multi-row statement (K7)
    sql = calls[0]["sql"]
    assert sql.startswith("INSERT INTO nextbus.route")
    assert "ON CONFLICT (agency_id, tag) DO UPDATE SET name = EXCLUDED.name" in sql
    # within-batch dedup happened before the write (A1)
    assert len(calls[0]["params"]) == 2 * 3  # 2 rows × 3 columns
    assert sql.count("(%s, %s, %s)") == 2


def test_foreach_batch_empty_is_noop(spark):
    for p in glob.glob(os.path.join(_CAPTURE_DIR, "*.json")):
        os.remove(p)
    empty = spark.createDataFrame([], "agency_id string, tag string, name string")
    writer = jdbc_upsert_writer(
        table="nextbus.route", key_cols=["agency_id", "tag"],
        connection_factory=_FileConn,
    )
    writer(empty, batch_id=1)
    assert _captured() == []  # T7: empty micro-batch short-circuits
