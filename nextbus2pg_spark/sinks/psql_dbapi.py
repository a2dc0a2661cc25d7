"""Minimal DB-API-shaped Postgres connection over the ``psql`` CLI.

The reference connects with psycopg2 in autocommit mode
(``/root/reference/connect.py:8-14``); deployment environments that
ship Postgres client binaries but no Python driver (this container is
one) can still run the engine's real upsert sink path through this
shim: ``sinks.upsert.jdbc_upsert_writer(connection_factory=
psql_connection_factory(...))`` executes its per-partition multi-row
``ON CONFLICT`` statements on executors, each statement via one
``psql -c`` invocation.

Scope — exactly what the upsert writer needs, nothing more:

- ``cursor().execute(sql, params)`` with psycopg2's ``format``
  paramstyle (``%s`` placeholders), substituted client-side into SQL
  literals (psql has no wire-protocol binding). Values are quoted with
  ``''`` escaping; None → NULL, bool → TRUE/FALSE, int/float pass
  through bare.
- autocommit semantics: every ``execute`` is its own transaction
  (``psql -c``), matching the reference's ``conn.autocommit = True`` —
  ``commit()`` is a no-op kept for DB-API shape.
- errors surface: a non-zero psql exit raises with stderr attached
  (``ON_ERROR_STOP``), so a failed upsert fails the Spark task and
  retries, the engine's at-least-once stance (T6).

NOT a general driver: no result fetching beyond raw text, no
transactions spanning statements, no type OIDs. For anything more, use
psycopg2/JDBC — this exists so the Postgres deployment path stays
*executable* (and therefore testable) with zero Python dependencies.
"""

from __future__ import annotations

import subprocess
from collections.abc import Callable, Sequence


def _literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # Postgres accepts non-finite floats only in their quoted
        # spelled-out forms; a bare nan/inf is a syntax error.
        if v != v:
            return "'NaN'"
        if v == float("inf"):
            return "'Infinity'"
        if v == float("-inf"):
            return "'-Infinity'"
        return str(v)
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def render_format_params(sql: str, params: Sequence | None) -> str:
    """Substitute psycopg2-style ``%s`` placeholders with SQL literals,
    left to right. Raises if the placeholder and parameter counts
    disagree (a silent mismatch would ship a malformed statement)."""
    if params is None:
        return sql
    parts = sql.split("%s")
    if len(parts) - 1 != len(params):
        raise ValueError(
            f"statement has {len(parts) - 1} placeholders, "
            f"got {len(params)} parameters"
        )
    out = [parts[0]]
    for lit, rest in zip(map(_literal, params), parts[1:]):
        out.append(lit)
        out.append(rest)
    return "".join(out)


class PsqlCursor:
    def __init__(self, conn: "PsqlConnection"):
        self._conn = conn
        self.rowcount = -1
        self._last_output = ""

    def execute(self, sql: str, params: Sequence | None = None) -> None:
        rendered = render_format_params(sql, params)
        self._last_output = self._conn._run(rendered)

    def fetchall(self) -> list[tuple]:
        """Rows of the last statement as tuples of strings (psql -At
        unaligned output) — enough for assertions and smoke reads."""
        return [
            tuple(line.split("|"))
            for line in self._last_output.splitlines()
            if line
        ]

    def close(self) -> None:
        pass


class PsqlConnection:
    """One logical connection; each execute is one ``psql -c`` call
    (autocommit, like the reference's connection factory)."""

    def __init__(
        self,
        socket_dir: str,
        user: str = "pguser",
        dbname: str = "postgres",
        psql: str = "psql",
    ):
        self.args = [
            psql, "-h", socket_dir, "-U", user, "-d", dbname,
            "-v", "ON_ERROR_STOP=1", "-At",
        ]

    def _run(self, sql: str) -> str:
        # SQL goes through stdin (psql -f -), NOT as a -c argument:
        # Linux caps a single argv element at ~128 KB (MAX_ARG_STRLEN),
        # which a multi-row VALUES statement for one healthy partition
        # easily exceeds — stdin has no such limit.
        p = subprocess.run(
            [*self.args, "-f", "-"], input=sql,
            capture_output=True, text=True,
        )
        if p.returncode != 0:
            raise RuntimeError(f"psql failed: {p.stderr.strip()[:500]}")
        return p.stdout

    def cursor(self) -> PsqlCursor:
        return PsqlCursor(self)

    def commit(self) -> None:
        pass  # autocommit: every statement already committed

    def close(self) -> None:
        pass  # no persistent process to release


def psql_connection_factory(
    socket_dir: str,
    user: str = "pguser",
    dbname: str = "postgres",
) -> Callable[[], PsqlConnection]:
    """Picklable factory for ``jdbc_upsert_writer(connection_factory=…)``
    — executors construct their own connection per partition."""
    from functools import partial

    return partial(PsqlConnection, socket_dir, user, dbname)
