"""Registry plumbing for fixture queries (kept import-cycle-free)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

#: Queries registered WITHOUT an oracle, by explicit declaration only.
#: The driver gives these the weaker rows-only check; tests and the
#: ``__spark_entry__`` docstring derive from this single constant so a
#: new rows-only registration can never silently desynchronize them.
ROWS_ONLY: set[str] = set()


def fixture(name: str, oracle: str | None = None, *, rows_only: bool = False):
    """Register a fixture query, optionally with its DuckDB oracle SQL.

    Every query must either carry an oracle or declare ``rows_only=True``
    (nondeterministic / approximate-by-construction outputs); registering
    with neither is an error so the correctness gate can't be skipped by
    accident.
    """

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        elif rows_only:
            ROWS_ONLY.add(name)
        else:
            raise ValueError(
                f"fixture {name!r} needs an oracle or rows_only=True"
            )
        return fn

    return wrap
