"""Operator library (SURVEY.md §2.2-2.8 + §2.12 extensions)."""

from nextbus2pg_spark.operators.keyed_write import (
    append_dedup,
    insert_if_absent,
    upsert_batch,
)
from nextbus2pg_spark.operators.joins import (
    broadcast_lookup,
    first_per_group,
    top1_per_group,
    two_level_fallback,
)

__all__ = [
    "append_dedup",
    "insert_if_absent",
    "upsert_batch",
    "broadcast_lookup",
    "first_per_group",
    "top1_per_group",
    "two_level_fallback",
]
