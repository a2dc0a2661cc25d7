"""ChangeFeedFollower contracts: a keyed replica driven purely by the
change feed tracks the table exactly; crashes re-deliver (at-least-
once + idempotent apply stays correct); lagging past retention fails
loudly and resync recovers."""

from __future__ import annotations

import pytest

from nextbus2pg_spark.pipelines.change_feed import (
    ChangeFeedFollower,
    RetentionLapsedError,
)
from nextbus2pg_spark.sinks.upsert import ParquetUpsertTable


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v string")


def _apply_keyed(replica: dict):
    """Idempotent keyed apply: deletes drop the preimage, inserts set
    the postimage — replaying the same delta is a no-op."""

    def apply_fn(changes):
        for r in changes.collect():
            if r._change_type == "delete":
                # only drop if the replica still holds this image
                if replica.get(r.k) == r.v:
                    del replica[r.k]
            else:
                replica[r.k] = r.v

    return apply_fn


def test_follower_tracks_table_and_survives_replay(spark, tmp_path):
    t = ParquetUpsertTable(
        spark, str(tmp_path / "t"), key_cols=["k"], update_cols=["v"],
        n_buckets=4,
    )
    t.store.keep_generations = 10
    follower = ChangeFeedFollower(t.store, str(tmp_path / "marker.json"))
    replica: dict = {}

    # a fresh follower must NOT be allowed to start mid-history
    t.upsert(_mk(spark, [("a", "v1"), ("b", "v1")]))
    with pytest.raises(RetentionLapsedError):
        follower.poll(_apply_keyed(replica))
    follower.resync(
        lambda df: replica.update({r.k: r.v for r in df.collect()})
    )
    assert replica == {"a": "v1", "b": "v1"}

    # incremental: upsert + delete arrive as one delta
    t.upsert(_mk(spark, [("a", "v2"), ("c", "v1")]))
    t.delete(spark.createDataFrame([("b",)], "k string"))
    assert follower.poll(_apply_keyed(replica)) is not None
    assert replica == {"a": "v2", "c": "v1"}
    # caught up: no-op poll
    assert follower.poll(_apply_keyed(replica)) is None

    # crash between apply and marker advance: same delta re-delivered;
    # idempotent apply keeps the replica exact
    t.upsert(_mk(spark, [("d", "v1")]))
    marker_before = follower.last_applied()
    follower.poll(_apply_keyed(replica))
    follower._advance(marker_before)  # simulate lost marker write
    follower.poll(_apply_keyed(replica))  # replay
    assert replica == {"a": "v2", "c": "v1", "d": "v1"}


def test_follower_lagging_past_retention_must_resync(spark, tmp_path):
    t = ParquetUpsertTable(
        spark, str(tmp_path / "t"), key_cols=["k"], update_cols=["v"],
        n_buckets=2,
    )  # default keep_generations=2: a tight window
    follower = ChangeFeedFollower(t.store, str(tmp_path / "marker.json"))
    replica: dict = {}
    t.upsert(_mk(spark, [("a", "v1")]))
    follower.resync(
        lambda df: replica.update({r.k: r.v for r in df.collect()})
    )
    # three publishes vacuum the follower's marker generation away
    for i in range(3):
        t.upsert(_mk(spark, [(f"k{i}", "v")]))
    with pytest.raises(RetentionLapsedError):
        follower.poll(_apply_keyed(replica))
    replica.clear()
    follower.resync(
        lambda df: replica.update({r.k: r.v for r in df.collect()})
    )
    assert replica == {"a": "v1", "k0": "v", "k1": "v", "k2": "v"}
    # and incremental consumption resumes
    t.upsert(_mk(spark, [("z", "v")]))
    follower.poll(_apply_keyed(replica))
    assert replica["z"] == "v"


def test_follower_with_hadoop_marker_io(spark, tmp_path):
    """HadoopMarkerIO keeps the marker on the STORE's filesystem
    (ADVICE round-5: a driver-local marker for a cluster store is only
    as durable as one machine): full follower lifecycle — resync,
    incremental poll, no-op poll, simulated lost-marker replay — runs
    against the gen-file marker directory, and stale gen files are
    pruned on advance."""
    import os

    from nextbus2pg_spark.pipelines.change_feed import HadoopMarkerIO

    t = ParquetUpsertTable(
        spark, str(tmp_path / "t"), key_cols=["k"], update_cols=["v"],
        n_buckets=4,
    )
    t.store.keep_generations = 10
    marker_dir = str(tmp_path / "t" / "_follower_marker")
    follower = ChangeFeedFollower(
        t.store, marker_dir, marker_io=HadoopMarkerIO(t.store)
    )
    replica: dict = {}

    t.upsert(_mk(spark, [("a", "v1"), ("b", "v1")]))
    with pytest.raises(RetentionLapsedError):  # no marker yet
        follower.poll(_apply_keyed(replica))
    follower.resync(
        lambda df: replica.update({r.k: r.v for r in df.collect()})
    )
    assert replica == {"a": "v1", "b": "v1"}

    t.upsert(_mk(spark, [("a", "v2"), ("c", "v1")]))
    t.delete(spark.createDataFrame([("b",)], "k string"))
    assert follower.poll(_apply_keyed(replica)) is not None
    assert replica == {"a": "v2", "c": "v1"}
    assert follower.poll(_apply_keyed(replica)) is None

    # lost-marker replay: rollback then re-poll re-delivers idempotently
    t.upsert(_mk(spark, [("d", "v1")]))
    marker_before = follower.last_applied()
    follower.poll(_apply_keyed(replica))
    follower._advance(marker_before)
    follower.poll(_apply_keyed(replica))
    assert replica == {"a": "v2", "c": "v1", "d": "v1"}

    # exactly one gen file survives each advance (stale ones pruned)
    gen_files = [
        f for f in os.listdir(marker_dir) if f.startswith("gen-")
    ]
    assert len(gen_files) == 1, gen_files
    assert int(gen_files[0].split("-")[1]) == follower.last_applied()


def test_custom_marker_io_is_injectable(spark, tmp_path):
    """Any read/write pair works as marker IO (e.g. a database row):
    the follower never touches the filesystem directly."""

    class DictMarkerIO:
        def __init__(self):
            self.store: dict = {}

        def read(self, path):
            return self.store.get(path)

        def write(self, path, gen):
            self.store[path] = gen

    io = DictMarkerIO()
    t = ParquetUpsertTable(
        spark, str(tmp_path / "t"), key_cols=["k"], update_cols=["v"],
        n_buckets=2,
    )
    follower = ChangeFeedFollower(t.store, "replica-7", marker_io=io)
    replica: dict = {}
    t.upsert(_mk(spark, [("a", "v1")]))
    follower.resync(
        lambda df: replica.update({r.k: r.v for r in df.collect()})
    )
    t.upsert(_mk(spark, [("b", "v1")]))
    follower.poll(_apply_keyed(replica))
    assert replica == {"a": "v1", "b": "v1"}
    assert io.store["replica-7"] == follower.last_applied()


def test_foreign_format_marker_routes_to_resync(spark, tmp_path):
    """A marker whose JSON parses to a non-dict (hand-written gen
    number, foreign tool) must read as 'no marker' and take the
    documented RetentionLapsedError -> resync path, not crash poll."""
    t = ParquetUpsertTable(
        spark, str(tmp_path / "t"), key_cols=["k"], update_cols=["v"],
        n_buckets=2,
    )
    t.upsert(_mk(spark, [("a", "v1")]))
    marker = tmp_path / "marker.json"
    for payload in ("3", "[3]", '"gen"', "{}", "not json"):
        marker.write_text(payload)
        follower = ChangeFeedFollower(t.store, str(marker))
        assert follower.last_applied() is None, payload
        with pytest.raises(RetentionLapsedError):
            follower.poll(lambda df: None)
    replica: dict = {}
    follower.resync(
        lambda df: replica.update({r.k: r.v for r in df.collect()})
    )
    assert replica == {"a": "v1"}
