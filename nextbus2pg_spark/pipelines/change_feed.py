"""Incremental change-feed consumer for ``BucketedParquetStore`` —
the downstream half of ``store.read_changes``: a follower that
remembers the last generation it applied and, per poll, hands the
caller exactly the delta since then.

Why this exists: the store's CDC read answers "what changed between
g and head", but a real consumer (a search index, an aggregate, a
replica) also needs the BOOKKEEPING — a durable marker, crash
semantics, and a defined story for falling behind the retention
window. This follower packages those so every consumer doesn't
re-invent them subtly wrong.

Delivery contract: AT-LEAST-ONCE. The marker advances only after
``apply_fn`` returns — a crash in between re-delivers the same delta
on restart, so ``apply_fn`` must be idempotent per generation (upsert/
delete by key is; blind appends are not). This matches the engine's
other sinks (``sinks/exactly_once.py`` documents the same stance and
the idempotence recipe).

Retention: the CDC window is bounded by the store's
``keep_generations`` (read_changes can only diff retained manifests).
A follower that lags past it gets :class:`RetentionLapsedError` and
must full-resync (``resync`` reads the current snapshot and fast-
forwards the marker) — the same contract as Delta CDF's
``startingVersion`` falling out of the log.
"""

from __future__ import annotations

import json
import os

from nextbus2pg_spark.sinks.store import BucketedParquetStore


class RetentionLapsedError(RuntimeError):
    """The follower's marker generation is no longer retained by the
    store; incremental catch-up is impossible — full resync required."""


class ChangeFeedFollower:
    """Durable-marker consumer of a store's change feed."""

    def __init__(self, store: BucketedParquetStore, marker_path: str):
        self.store = store
        self.marker_path = marker_path

    # -- marker -------------------------------------------------------

    def last_applied(self) -> int | None:
        """Marker generation, or None when absent OR unreadable: a
        torn/empty marker (power loss between rename and data flush)
        must route into the documented RetentionLapsedError → resync
        recovery path, not crash every poll with a JSON error."""
        try:
            with open(self.marker_path, encoding="utf-8") as f:
                return int(json.load(f)["gen"])
        except FileNotFoundError:
            return None
        except (ValueError, KeyError, json.JSONDecodeError):
            return None  # torn marker == no marker: resync recovers

    def _advance(self, gen: int) -> None:
        """Atomic marker publish: tmp + fsync + rename — the fsync
        matters (ext4 delayed allocation can journal the rename before
        the data, leaving a zero-length marker after power loss). Same
        commit shape as the store's manifests; on HDFS/object storage
        keep the marker beside the store and use its FS."""
        tmp = f"{self.marker_path}.tmp"
        os.makedirs(os.path.dirname(self.marker_path) or ".", exist_ok=True)
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"gen": gen}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.marker_path)

    # -- consumption --------------------------------------------------

    def poll(self, apply_fn) -> int | None:
        """Apply the delta since the marker. ``apply_fn(changes_df)``
        receives the change frame (table columns + ``_change_type``);
        the marker advances to the head generation only after it
        returns. Returns the generation caught up to, or None when
        already current. First poll (no marker, including a torn
        unreadable one) raises
        RetentionLapsedError — a new follower must start from a
        snapshot, not from an arbitrary mid-history delta."""
        head = self.store.current_manifest()["gen"]
        last = self.last_applied()
        if last is None or last not in self.store.generations():
            raise RetentionLapsedError(
                f"marker gen {last} is outside the store's retained "
                f"window {self.store.generations()}; call resync()"
            )
        if last == head:
            return None
        apply_fn(self.store.read_changes(last, head))
        self._advance(head)
        return head

    def resync(self, apply_full_fn) -> int:
        """Full catch-up: hand the CURRENT snapshot to
        ``apply_full_fn(df)`` and fast-forward the marker to its
        generation. The snapshot generation is captured BEFORE the
        read so a publish racing the resync re-delivers (at-least-
        once) rather than skips."""
        gen = self.store.current_manifest()["gen"]
        apply_full_fn(self.store.read_generation(gen))
        self._advance(gen)
        return gen
