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
