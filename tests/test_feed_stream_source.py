"""Python DataSource V2 feed source: per-route offsets, incremental
micro-batches, checkpoint restart, batch mode — the reference's
request_times contract (route.py:151-170) as a first-class stream."""

from __future__ import annotations

import os

from nextbus2pg_spark.sources.feed_stream import VehicleFeedDataSource

XML = """<?xml version="1.0"?>
<body>
  <vehicle id="{vid}" dirTag="d1" lon="-122.4" lat="37.7"
           secsSinceReport="9" predictable="true"/>
  <lastTime time="{ms}"/>
</body>
"""


def _drop(spool, route, ms, vid):
    with open(os.path.join(spool, f"{route}__{ms}.xml"), "w") as f:
        f.write(XML.format(vid=vid, ms=ms))


def _run_stream(spark, spool, out_path, ckpt):
    q = (
        spark.readStream.format("nextbus_feed")
        .option("path", spool)
        .load()
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_path)


def test_stream_incremental_and_restart(spark, tmp_path):
    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _drop(spool, "38R", 1000, "v1")
    _drop(spool, "38R", 2000, "v2")
    _drop(spool, "J", 1500, "v9")
    got = _run_stream(spark, spool, out, ckpt)
    rows = {(r.route_tag, r.vehicle_id, r.request_time_ms)
            for r in got.collect()}
    assert rows == {("38R", "v1", 1000), ("38R", "v2", 2000),
                    ("J", "v9", 1500)}

    # Restart from the SAME checkpoint: old documents are not
    # reprocessed (offsets {route: last_ms} live in the checkpoint,
    # unlike the reference's in-memory dict), new ones are.
    _drop(spool, "38R", 3000, "v3")
    got = _run_stream(spark, spool, out, ckpt)
    rows = sorted((r.vehicle_id, r.request_time_ms) for r in got.collect())
    assert rows == [("v1", 1000), ("v2", 2000), ("v3", 3000), ("v9", 1500)]


def test_stream_empty_spool_yields_no_batch(spark, tmp_path):
    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    q = (
        spark.readStream.format("nextbus_feed")
        .option("path", spool)
        .load()
        .writeStream.format("memory")
        .queryName("feed_empty")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT * FROM feed_empty").count() == 0


def test_batch_mode_reads_full_spool(spark, tmp_path):
    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    _drop(spool, "38R", 1000, "v1")
    _drop(spool, "route_with_underscore", 2000, "v2")
    df = spark.read.format("nextbus_feed").option("path", spool).load()
    rows = {(r.route_tag, r.vehicle_id) for r in df.collect()}
    assert rows == {("38R", "v1"), ("route_with_underscore", "v2")}
    # schema matches the RAW_FEED_SCHEMA contract
    from nextbus2pg_spark.sources.feed import RAW_FEED_SCHEMA

    assert df.schema == RAW_FEED_SCHEMA


def test_end_to_end_reference_pipeline_on_dsv2_source(spark, tmp_path):
    """The whole reference app shape (run.py:29-66) on first-class
    parts: DSv2 feed source (per-route checkpointed offsets) →
    transform (route.py:197-204) → service resolution (two-level
    fallback) → event-grain dedup → append-only keyed store. Second
    run after new documents ingests ONLY the new batch (incremental)
    and the store accumulates, like vehicle_location (agency.py:
    303-322)."""
    from pyspark.sql import functions as F

    from nextbus2pg_spark.sinks.upsert import ParquetUpsertTable
    from nextbus2pg_spark.streaming.ingest import DEDUP_KEYS, start_ingest

    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    _drop(spool, "38R", 1_000_000, "v1")
    _drop(spool, "38R", 2_000_000, "v1")  # same vehicle, later doc
    _drop(spool, "J", 1_500_000, "v9")

    dims = spark.createDataFrame(
        [("d1", "svc-d1")], "tag string, service_id string"
    )
    table = ParquetUpsertTable(
        spark, str(tmp_path / "locations"), key_cols=list(DEDUP_KEYS),
        n_buckets=4,
    )

    def sink(batch_df, batch_id):
        table.append_dedup(batch_df)

    raw = (
        spark.readStream.format("nextbus_feed").option("path", spool).load()
    )
    q = start_ingest(
        raw,
        dims_provider=lambda: (dims, dims.limit(0)),
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    first = table.read().collect()
    # v1 appears twice (two request times -> two location timestamps)
    assert {(r.vehicle_tag, r.service_id) for r in first} == {
        ("v1", "svc-d1"), ("v9", "svc-d1")
    }
    assert len(first) == 3
    assert all(r.vehicle_location.lon == -122.4 for r in first)

    # Incremental restart: one new document, one new row.
    _drop(spool, "J", 3_000_000, "v9")
    q = start_ingest(
        raw,
        dims_provider=lambda: (dims, dims.limit(0)),
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert table.read().count() == 4
    # event time = request time (rounded s) - secsSinceReport (9s)
    ts = {
        r.location_timestamp for r in table.read().collect()
    }
    import datetime as dt

    assert dt.datetime(1970, 1, 1, 0, 49, 51) in ts  # 3000s - 9s


def test_permissive_mode_skips_corrupt_documents(spark, tmp_path):
    import pytest

    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    _drop(spool, "38R", 1000, "v1")
    with open(os.path.join(spool, "38R__2000.xml"), "w") as f:
        f.write("<body><vehicle id='truncated")  # mid-write capture
    # default failfast surfaces the parse error
    with pytest.raises(Exception):
        (
            spark.read.format("nextbus_feed").option("path", spool)
            .load().collect()
        )
    # permissive skips the bad document, keeps the good one
    rows = (
        spark.read.format("nextbus_feed").option("path", spool)
        .option("mode", "permissive").load().collect()
    )
    assert [(r.vehicle_id, r.request_time_ms) for r in rows] == [("v1", 1000)]


def test_max_docs_per_batch_bounds_backfill(spark, tmp_path):
    """Admission control: a 9-document backfill with
    max_docs_per_batch=3 drains in multiple bounded micro-batches —
    every document still lands exactly once."""
    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    for i in range(1, 10):
        _drop(spool, "38R", i * 1000, f"v{i}")
    batches = []

    def record(batch_df, batch_id):
        batches.append(batch_df.count())

    import time

    q = (
        spark.readStream.format("nextbus_feed")
        .option("path", spool)
        .option("max_docs_per_batch", "3")
        .load()
        .writeStream.foreachBatch(record)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    # continuous trigger: wait until the backfill drains, then stop
    deadline = time.time() + 120
    while sum(batches) < 9 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    assert sum(batches) == 9
    assert max(batches) <= 3
    assert len([b for b in batches if b]) >= 3


def test_restart_with_throttle_never_regresses_offsets(spark, tmp_path):
    """ADVICE r3 (high): after a restart the in-memory throttle
    baseline is empty — a throttled latestOffset computed from 0 would
    emit per-route offsets BELOW the checkpointed start, rewinding the
    offset log and re-reading committed documents. The first
    post-restart latestOffset must return the unthrottled latest
    instead; every document lands exactly once across the restart."""
    import time

    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    counts: list[int] = []

    def run_until(n_total):
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)
            counts.append(batch_df.count())

        q = (
            spark.readStream.format("nextbus_feed")
            .option("path", spool)
            .option("max_docs_per_batch", "2")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 120
        while sum(counts) < n_total and time.time() < deadline:
            time.sleep(0.5)
        time.sleep(1.5)  # let the in-flight trigger finish cleanly
        q.stop()
        q.awaitTermination(30)

    for i in range(1, 6):
        _drop(spool, "38R", i * 1000, f"v{i}")
    run_until(5)
    assert spark.read.parquet(out).count() == 5
    assert max(counts) <= 2  # throttle held on the cold-start drain

    # Restart with the throttle still set and MORE documents behind
    # the committed offset available in the spool: the buggy reader
    # re-read v3..v5 here (duplicates); the fixed one resumes at 5000.
    counts.clear()
    for i in range(6, 10):
        _drop(spool, "38R", i * 1000, f"v{i}")
    run_until(4)

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 9  # exactly once — no re-reads across restart
    assert {r.vehicle_id for r in rows} == {f"v{i}" for i in range(1, 10)}


def test_reader_call_order_contract_throttled(tmp_path):
    """Unit-level pin of the measured PySpark call orders (no Spark
    session): cold start = latestOffset first (throttle from 0 is the
    bounded-backfill contract); restart = partitions(start, …) first
    (the start dict seeds the baseline, so the next throttled
    latestOffset resumes FROM the checkpoint, never behind it)."""
    from nextbus2pg_spark.sources.feed_stream import (
        VehicleFeedStreamReader,
    )

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    for i in range(1, 10):
        _drop(spool, "38R", i * 1000, f"v{i}")

    # cold start: first call is latestOffset — bounded from 0
    cold = VehicleFeedStreamReader(spool, max_docs_per_batch=2)
    assert cold.latestOffset() == {"38R": 2000}
    assert cold.latestOffset() == {"38R": 4000}

    # restart: replay partitions(start=checkpoint) always precedes the
    # first latestOffset — the throttle resumes at 5000, not 2000
    warm = VehicleFeedStreamReader(spool, max_docs_per_batch=2)
    warm.partitions({"38R": 5000}, {"38R": 5000})
    assert warm.latestOffset() == {"38R": 7000}
    # a committed end behind the baseline can never pull it back
    warm.commit({"38R": 3000})
    assert warm.latestOffset() == {"38R": 9000}

def test_purge_committed_bounds_spool_and_resumes(spark, tmp_path):
    """Spool hygiene: with purge_committed, files at-or-below each
    route's PROVEN-committed offset are removed. The proof signals the
    Python source API exposes are partitions()'s start dict and
    commit()'s end, and commit only fires when the NEXT batch is
    planned — so purge lags exactly one batch: after a drain, only the
    final batch's files remain (bounded by the throttle), everything
    older is gone, and the latestOffset() listing stays bounded on a
    long-running stream. Restart from the checkpoint still resumes at
    the right position (offsets live in the checkpoint, not the
    spool) and reclaims that final batch."""
    import time

    spark.dataSource.register(VehicleFeedDataSource)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    counts: list[int] = []

    def run_until(n_batch_rows):
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)
            counts.append(batch_df.count())

        q = (
            spark.readStream.format("nextbus_feed")
            .option("path", spool)
            .option("purge_committed", "true")
            .option("max_docs_per_batch", "2")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 120
        while sum(counts) < n_batch_rows and time.time() < deadline:
            time.sleep(0.5)
        time.sleep(2.5)  # idle trigger ticks run the purge floor
        q.stop()
        q.awaitTermination(30)

    for i in range(1, 6):
        _drop(spool, "38R", i * 1000, f"v{i}")
    _drop(spool, "J", 1500, "v9")
    run_until(6)
    assert spark.read.parquet(out).count() == 6
    # everything up to the last batch's start is purged; only the
    # final (committed-but-unproven) batch's files may remain
    assert os.listdir(spool) == ["38R__5000.xml"]

    # restart: the replay's start dict proves the checkpointed offsets
    # → the leftover file purges, and only new documents land
    counts.clear()
    _drop(spool, "38R", 9000, "v9b")
    run_until(1)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 7  # no re-reads, no losses
    assert {r.vehicle_id for r in rows} == {
        "v1", "v2", "v3", "v4", "v5", "v9", "v9b"
    }
    assert os.listdir(spool) == ["38R__9000.xml"]


def test_archive_dir_moves_committed_files(tmp_path):
    """archive_dir variant (reader-level): committed documents move to
    the archive instead of being deleted (replay/debug retention), in
    both the commit() and partitions() purge hooks."""
    from nextbus2pg_spark.sources.feed_stream import (
        VehicleFeedStreamReader,
    )

    spool = str(tmp_path / "spool")
    arch = str(tmp_path / "archive")
    os.makedirs(spool)
    _drop(spool, "38R", 1000, "v1")
    _drop(spool, "38R", 2000, "v2")
    _drop(spool, "38R", 3000, "v3")
    r = VehicleFeedStreamReader(spool, archive_dir=arch)
    assert r.purge_committed  # archive_dir implies purge
    r.commit({"38R": 1000})
    assert sorted(os.listdir(arch)) == ["38R__1000.xml"]
    # partitions() purges everything at-or-below its start dict
    r.partitions({"38R": 2000}, {"38R": 3000})
    assert sorted(os.listdir(arch)) == ["38R__1000.xml", "38R__2000.xml"]
    assert sorted(os.listdir(spool)) == ["38R__3000.xml"]

def test_purge_archive_crash_between_plan_and_commit(tmp_path):
    """The crossed restart case: purge+archive ON, crash AFTER a batch
    is planned but BEFORE it commits (including a crash mid-purge that
    leaves the archive half-moved). The restart replays
    partitions(start, end) for the in-flight batch — every document of
    that batch must still be readable from the spool at replay time
    (purge only ever touches files at-or-below the PROVEN-committed
    start, never the replayed window), and the interrupted purge
    completes idempotently."""
    from nextbus2pg_spark.sources.feed_stream import (
        VehicleFeedStreamReader,
        _parse_files,
    )

    spool = str(tmp_path / "spool")
    arch = str(tmp_path / "archive")
    os.makedirs(spool)
    for i in range(1, 6):
        _drop(spool, "38R", i * 1000, f"v{i}")

    # Session 1: batch 1 (<=2000) commits; batch 2 (2000, 4000] is
    # planned; the process dies before batch 2 commits.
    r1 = VehicleFeedStreamReader(
        spool, max_docs_per_batch=2, archive_dir=arch
    )
    r1.partitions({}, {"38R": 2000})
    r1.commit({"38R": 2000})  # purge moves v1, v2 to the archive
    assert sorted(os.listdir(arch)) == ["38R__1000.xml", "38R__2000.xml"]
    planned = r1.partitions({"38R": 2000}, {"38R": 4000})
    assert len(planned) == 1  # batch 2 in flight ... crash here

    # Simulate a crash MID-PURGE too: one committed file was moved to
    # the archive but its sibling was not (partial purge of a racing
    # commit) — replay must tolerate and complete it.
    os.rename(
        os.path.join(arch, "38R__2000.xml"),
        os.path.join(spool, "38R__2000.xml"),
    )

    # Session 2 (restart): Spark replays the planned-but-uncommitted
    # batch with the SAME offsets before anything else.
    r2 = VehicleFeedStreamReader(
        spool, max_docs_per_batch=2, archive_dir=arch
    )
    replay = r2.partitions({"38R": 2000}, {"38R": 4000})
    assert len(replay) == 1
    rows = list(_parse_files("38R", replay[0].files))
    assert [t[2] for t in rows] == ["v3", "v4"], (
        "replayed batch must read every document it planned"
    )
    # the half-moved committed file completed its purge idempotently
    assert sorted(os.listdir(arch)) == ["38R__1000.xml", "38R__2000.xml"]
    # stream continues: batch 2 commits, batch 3 drains the tail
    r2.commit({"38R": 4000})
    assert sorted(os.listdir(arch)) == [
        "38R__1000.xml", "38R__2000.xml", "38R__3000.xml", "38R__4000.xml",
    ]
    assert r2.latestOffset() == {"38R": 5000}
    tail = r2.partitions({"38R": 4000}, {"38R": 5000})
    assert [t[2] for t in _parse_files("38R", tail[0].files)] == ["v5"]


# ---------------------------------------------------------------------------
# Model-based property test: the reader vs a simulated Spark driver
# ---------------------------------------------------------------------------

def test_reader_model_random_schedules(tmp_path):
    """Property (hypothesis): under ANY interleaving of document
    arrivals, micro-batches, crashes mid-batch (uncommitted replay)
    and clean restarts — with and without spool purging, issued in
    the call orders this build's Spark
    measurably uses (cold: latestOffset first; restart: partitions
    replay first; the source-commit callback fires only when the NEXT
    batch is planned) — the reader delivers every document to exactly
    one batch id and loses nothing. Throttled and unthrottled readers
    both hold the invariant."""
    from hypothesis import given, settings, strategies as st

    from nextbus2pg_spark.sources.feed_stream import (
        VehicleFeedStreamReader,
    )

    class DriverSim:
        """The measured MicroBatchExecution contract, minus Spark.

        Distinguishes Spark's OWN commit log (written the moment a
        batch finishes running) from the source-commit callback
        (invoked only while planning the next batch): crash recovery
        replays only batches absent from the commit log."""

        def __init__(self, spool, throttle, purge):
            self.spool = spool
            self.throttle = throttle
            self.purge = purge
            self.reader = VehicleFeedStreamReader(
                spool, max_docs_per_batch=throttle,
                purge_committed=purge,
            )
            self.committed: dict = {}      # commit-log head position
            self.pending: dict | None = None  # planned, crashed mid-run
            self.n_batches = 0
            self.delivered: list[set[str]] = []
            self.reader.initialOffset()  # cold start only

        def _read(self, start, end):
            parts = self.reader.partitions(start, end)
            return {f for p in parts for f in p.files}

        def plan_and_run(self, complete=True):
            assert self.pending is None  # crash first to clear it
            end = self.reader.latestOffset()
            if end == self.committed or not end:
                return
            if self.n_batches:
                # source-commit of the previous batch fires now
                self.reader.commit(self.committed)
            files = self._read(self.committed, end)
            self.delivered.append(files)
            self.n_batches += 1
            if complete:
                self.committed = end  # Spark's commit log, immediate
            else:
                self.pending = end    # crashed before the commit log

        def restart(self):
            self.reader = VehicleFeedStreamReader(
                self.spool, max_docs_per_batch=self.throttle,
                purge_committed=self.purge,
            )
            if self.pending is not None:
                # replay the uncommitted offset-log head: same batch
                # id re-runs — re-delivery REPLACES it, as foreachBatch
                # rerun with an identical batch id does
                files = self._read(self.committed, self.pending)
                self.delivered[-1] = files
                self.committed = self.pending
                self.pending = None
            else:
                # measured: Spark still replays the committed head as
                # a no-op partitions(start == end) call
                self._read(self.committed, self.committed)

    @settings(max_examples=40, deadline=None)
    @given(
        ops=st.lists(
            st.sampled_from(
                ["drop_a", "drop_b", "batch", "crash_mid", "restart"]
            ),
            min_size=1, max_size=30,
        ),
        throttle=st.sampled_from([None, 1, 2]),
        purge=st.booleans(),
    )
    def run(ops, throttle, purge):
        import shutil as _sh
        import tempfile

        spool = tempfile.mkdtemp(prefix="model-", dir=str(tmp_path))
        try:
            sim = DriverSim(spool, throttle, purge)
            clock = {"A": 0, "B": 0}
            expected: set[str] = set()
            for op in ops:
                if op.startswith("drop"):
                    route = "A" if op == "drop_a" else "B"
                    clock[route] += 1000
                    _drop(spool, route, clock[route],
                          f"v{route}{clock[route]}")
                    expected.add(f"{route}__{clock[route]}.xml")
                elif op == "batch":
                    sim.plan_and_run(complete=True)
                elif op == "crash_mid":
                    sim.plan_and_run(complete=False)
                    sim.restart()
                else:
                    sim.restart()
            for _ in range(2 * len(ops) + 2):  # drain the tail
                sim.plan_and_run(complete=True)

            got = [
                {os.path.basename(f) for f in batch}
                for batch in sim.delivered
            ]
            flat = [n for b in got for n in b]
            assert len(flat) == len(set(flat)), f"double-delivery: {got}"
            assert set(flat) == expected, (
                f"lost={expected - set(flat)} extra={set(flat) - expected}"
            )
        finally:
            _sh.rmtree(spool, ignore_errors=True)

    run()
